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
  */
final class TopKBuffer(val k: Int) {
  import TopKBuffer._
  val heap = new java.util.PriorityQueue[Entry](math.max(k, 1), WorstFirst)

  def insert(score: Double, id: Long): Unit =
    if (heap.size < k) heap.offer(new Entry(score, id))
    else {
      val w = heap.peek()
      if (score > w.score || (score == w.score && id < w.id)) {
        heap.poll()
        heap.offer(new Entry(score, id))
      }
    }

  /** Entries best-first: score desc, id asc. */
  def sorted: Array[Entry] = {
    val arr = heap.toArray(new Array[Entry](heap.size))
    java.util.Arrays.sort(arr, BestFirst)
    arr
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
    other.heap.forEach(e => b.insert(e.score, e.id))
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
