package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) entries
  * in a worst-first binary heap — O(log k) per insert, O(k) memory, and
  * a deterministic result set (the ordering is total, so the surviving k
  * are unique regardless of insertion / partition order).
  *
  * PRIMITIVE-ARRAY heap (r13): the original java.util.PriorityQueue of
  * boxed Entry objects allocated one Entry PER INSERT — harmless at the
  * published k ≤ 240, but the corpus-fraction ANN shortlists put k at
  * N/20 (100k at the 2M-vector probe), and the resulting tens of
  * millions of short-lived objects per query didn't just slow the ANN
  * family: the old-gen pressure taxed EVERY later query in the shared
  * bench JVM ~1.6× (q_component_labels 351 s in-suite vs 218 s alone).
  * Two parallel primitive arrays + manual sift = zero allocation per
  * insert; ordering semantics, serialization bytes, and results are
  * unchanged.
  */
final class TopKBuffer(val k: Int) {
  // worst-first heap over parallel primitive arrays: root (index 0) is
  // the entry to evict — lowest score, then largest id
  private var scores = new Array[Double](math.min(math.max(k, 1), 1024))
  private var ids = new Array[Long](scores.length)
  private var n = 0

  def size: Int = n

  // heap order: a before b when (a.score, -a.id) < (b.score, -b.id)
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  private def grow(): Unit = {
    val cap = math.min(k, math.max(2 * scores.length, 4))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    val s = scores(i); val id = ids(i)
    while (i > 0 && worse(s, id, scores((i - 1) >> 1), ids((i - 1) >> 1))) {
      val p = (i - 1) >> 1
      scores(i) = scores(p); ids(i) = ids(p)
      i = p
    }
    scores(i) = s; ids(i) = id
  }

  private def siftDown(): Unit = {
    var i = 0
    val s = scores(0); val id = ids(0)
    while (true) {
      var c = 2 * i + 1
      if (c >= n) { scores(i) = s; ids(i) = id; return }
      if (c + 1 < n && worse(scores(c + 1), ids(c + 1), scores(c), ids(c))) c += 1
      if (worse(scores(c), ids(c), s, id)) {
        scores(i) = scores(c); ids(i) = ids(c)
        i = c
      } else { scores(i) = s; ids(i) = id; return }
    }
  }

  def insert(score: Double, id: Long): Unit =
    if (n < k) {
      if (n == scores.length) grow()
      scores(n) = score; ids(n) = id
      n += 1
      siftUp(n - 1)
    } else if (score > scores(0) || (score == scores(0) && id < ids(0))) {
      scores(0) = score; ids(0) = id
      siftDown()
    }

  /** Entries best-first: score desc, id asc. */
  def sorted: Array[TopKBuffer.Entry] = {
    val arr = new Array[TopKBuffer.Entry](n)
    var i = 0
    while (i < n) { arr(i) = new TopKBuffer.Entry(scores(i), ids(i)); i += 1 }
    java.util.Arrays.sort(arr, TopKBuffer.BestFirst)
    arr
  }

  /** Zero-allocation iteration for merge. */
  def foreachEntry(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }
}

object TopKBuffer {
  final class Entry(val score: Double, val id: Long)
  /** Heap order: head is the entry to evict — lowest score, then largest id. */
  val WorstFirst: Comparator[Entry] = (a: Entry, b: Entry) => {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c else java.lang.Long.compare(b.id, a.id)
  }
  val BestFirst: Comparator[Entry] = (a: Entry, b: Entry) => WorstFirst.compare(b, a)
}

/** `topk_by_score(score, id, k)`: per-group bounded top-k as a
  * TypedImperativeAggregate.
  *
  * This is THE scale fix for per-query top-k ranking: with a window
  * (`row_number over partitionBy(query)`) the exchange carries every
  * scored row (N×Q for ANN); as a partial-merge aggregate each map task
  * ships at most k entries per group, so the exchange carries
  * tasks×groups×k rows — independent of corpus size. Output is
  * `array<struct<id, score>>` best-first; `posexplode` it for ranks.
  */
case class TopKByScore(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {
  require(k > 0, "k must be positive")

  private def score: Expression = left
  private def id: Expression = right

  override def prettyName: String = "topk_by_score"
  override def nullable: Boolean = false
  override val dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreachEntry((s, i) => b.insert(s, i))
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map(e =>
      new GenericInternalRow(Array[Any](e.id, e.score))))

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val entries = b.sorted
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { e => bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.insert(bb.getDouble(), bb.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKByScore = copy(left = l, right = r)
}

object TopKByScore {
  /** Column-facing constructor. */
  def agg(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(
        ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
