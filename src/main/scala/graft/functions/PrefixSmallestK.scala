package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded "k smallest (hi, lo) pairs" buffer: a largest-first binary
  * heap over two parallel primitive long arrays — O(log k) per insert,
  * O(k) memory, zero allocation per insert (the [[TopKBuffer]]
  * discipline). Ordering is SIGNED lexicographic on (hi, lo), i.e.
  * exactly `sort_array` order over `struct<hi: long, lo: long>` — the
  * caller encodes any unsigned semantics into the longs (the simjoin
  * prefix packs rank<<56|g>>>8 into hi, so hi ≥ 0, and g XOR
  * Long.MinValue into lo, so signed lo order == unsigned g order).
  *
  * k is PER-GROUP, read from the aggregate's third child on the first
  * non-null input row (every row of a group must carry the same k —
  * the simjoin prefix joins a per-doc prefix length onto the gram
  * stream, so the invariant holds by construction). An empty partial
  * carries k = -1 and adopts its merge partner's.
  */
final class SmallestKBuffer(var k: Int) {
  private var his = new Array[Long](math.min(math.max(k, 4), 1024))
  private var los = new Array[Long](his.length)
  private var n = 0

  def size: Int = n

  // heap order: a before b when (a.hi, a.lo) > (b.hi, b.lo) — root is
  // the LARGEST pair, the one to evict
  @inline private def worse(h1: Long, l1: Long, h2: Long, l2: Long): Boolean = {
    val c = java.lang.Long.compare(h1, h2)
    c > 0 || (c == 0 && l1 > l2)
  }

  private def grow(): Unit = {
    val cap = math.min(k, math.max(2 * his.length, 4))
    his = java.util.Arrays.copyOf(his, cap)
    los = java.util.Arrays.copyOf(los, cap)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    val h = his(i); val l = los(i)
    while (i > 0 && worse(h, l, his((i - 1) >> 1), los((i - 1) >> 1))) {
      val p = (i - 1) >> 1
      his(i) = his(p); los(i) = los(p)
      i = p
    }
    his(i) = h; los(i) = l
  }

  private def siftDown(): Unit = {
    var i = 0
    val h = his(0); val l = los(0)
    while (true) {
      var c = 2 * i + 1
      if (c >= n) { his(i) = h; los(i) = l; return }
      if (c + 1 < n && worse(his(c + 1), los(c + 1), his(c), los(c))) c += 1
      if (worse(his(c), los(c), h, l)) {
        his(i) = his(c); los(i) = los(c)
        i = c
      } else { his(i) = h; los(i) = l; return }
    }
  }

  def insert(hi: Long, lo: Long): Unit =
    if (n < k) {
      if (n == his.length) grow()
      his(n) = hi; los(n) = lo
      n += 1
      siftUp(n - 1)
    } else if (k > 0 &&
        (hi < his(0) || (hi == his(0) && lo < los(0)))) {
      his(0) = hi; los(0) = lo
      siftDown()
    }

  /** Entries smallest-first: (hi, lo) signed lexicographic ascending. */
  def sorted: Array[(Long, Long)] = {
    val arr = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) { arr(i) = (his(i), los(i)); i += 1 }
    java.util.Arrays.sort(arr, (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    arr
  }

  /** Zero-allocation iteration for merge. */
  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(his(i), los(i)); i += 1 }
  }
}

/** `smallest_k(hi, lo, k)`: per-group bounded k-smallest (hi, lo) long
  * pairs as a TypedImperativeAggregate; output
  * `array<struct<hi, lo>>` ascending — identical to
  * `slice(sort_array(collect_list(struct(hi, lo))), 1, k)` for any
  * per-group-constant k.
  *
  * This is the single-node form of the simjoin exact-df prefix
  * (SURVEY §5 note 21, r15 A/B record): the collect_list + sort_array
  * regroup it replaces shipped one O(doc-grams) ARRAY partial per
  * (doc × map partition) through ObjectHashAggregate's sort-based
  * fallback — at 500k docs that spilled the full corpus×grams struct
  * stream twice and ENOSPC'd the probe host. Heap partials are bounded
  * at k entries (the ~0.2·m prefix, 16 bytes each), the exchange
  * carries plain bounded buffers, and the final pass never
  * materializes a full per-doc gram array at all.
  */
case class PrefixSmallestK(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmallestKBuffer] with TernaryLike[Expression] {

  private def hi: Expression = first
  private def lo: Expression = second
  private def kExpr: Expression = third

  override def prettyName: String = "smallest_k"
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hi", LongType, nullable = false),
      StructField("lo", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): SmallestKBuffer = new SmallestKBuffer(-1)

  override def update(b: SmallestKBuffer, input: InternalRow): SmallestKBuffer = {
    val h = hi.eval(input)
    val l = lo.eval(input)
    val k = kExpr.eval(input)
    if (h != null && l != null && k != null) {
      if (b.k < 0) {
        val kv = k.asInstanceOf[Number].intValue()
        require(kv >= 1, s"smallest_k: k must be >= 1, got $kv")
        b.k = kv
      }
      b.insert(h.asInstanceOf[Long], l.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: SmallestKBuffer, other: SmallestKBuffer): SmallestKBuffer = {
    if (b.k < 0) b.k = other.k
    other.foreachEntry((h, l) => b.insert(h, l))
    b
  }

  override def eval(b: SmallestKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (h, l) =>
      new GenericInternalRow(Array[Any](h, l))
    })

  override def serialize(b: SmallestKBuffer): Array[Byte] = {
    val entries = b.sorted
    val bb = ByteBuffer.allocate(8 + entries.length * 16)
    bb.putInt(b.k)
    bb.putInt(entries.length)
    entries.foreach { case (h, l) => bb.putLong(h); bb.putLong(l) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SmallestKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val n = bb.getInt()
    val b = new SmallestKBuffer(k)
    var i = 0
    while (i < n) { b.insert(bb.getLong(), bb.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): PrefixSmallestK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PrefixSmallestK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PrefixSmallestK =
    copy(first = f, second = s, third = t)
}

object PrefixSmallestK {
  /** Column-facing constructor: k is a per-row column (per-group
    * constant by contract). */
  def agg(hi: Column, lo: Column, k: Column): Column =
    ColumnBridge.column(
      PrefixSmallestK(
        ColumnBridge.expression(hi), ColumnBridge.expression(lo),
        ColumnBridge.expression(k))
        .toAggregateExpression())
}
