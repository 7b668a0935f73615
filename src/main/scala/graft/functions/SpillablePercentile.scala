package graft.functions

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Disk-spilling value buffer for exact order statistics.
  *
  * Values accumulate in a primitive double array; past `spillThreshold`
  * entries the array is sorted and written to a temp file as one SORTED
  * RUN, so resident memory per group is capped at ~8·spillThreshold
  * bytes no matter the group size — where the built-in `percentile`
  * aggregate's one-object-array-per-group buffer cannot spill and falls
  * over somewhere between sf1 and sf10 per group. Order statistics come
  * from a k-way merge of the runs plus the sorted in-memory tail: one
  * streaming pass, never the whole group in memory.
  */
object PercentileBuf {
  /** Process-local spilled-bytes telemetry. The run files live outside
    * Spark's spill accounting (TaskMetrics.diskBytesSpilled covers only
    * shuffle/aggregate spill), so constrained-memory probes read this
    * to report how much the percentile path actually put on disk. Local
    * mode only sees the full picture (one JVM); on a cluster it is a
    * per-executor number.
    */
  val spilledBytes = new java.util.concurrent.atomic.LongAdder
}

final class PercentileBuf(val spillThreshold: Int) {
  private var inMem = new Array[Double](math.min(spillThreshold, 1 << 12))
  private var n = 0
  private[functions] val runs = ArrayBuffer.empty[(File, Long)] // (sorted run, count)

  /** Total values held: in-memory tail + every spilled run. */
  def total: Long = {
    var t = n.toLong
    runs.foreach(t += _._2)
    t
  }

  def add(v: Double): Unit = {
    if (n == inMem.length) {
      if (n >= spillThreshold) spill()
      else {
        val bigger = new Array[Double](math.min(inMem.length * 2, spillThreshold))
        System.arraycopy(inMem, 0, bigger, 0, n)
        inMem = bigger
      }
    }
    inMem(n) = v; n += 1
  }

  private def spillDir: File = {
    val env = org.apache.spark.SparkEnv.get
    val d =
      if (env != null)
        env.conf.get("spark.local.dir", System.getProperty("java.io.tmpdir"))
      else System.getProperty("java.io.tmpdir")
    new File(d.split(",")(0))
  }

  private def spill(): Unit = if (n > 0) {
    java.util.Arrays.sort(inMem, 0, n)
    val f = File.createTempFile("graft-pctl-", ".run", spillDir)
    f.deleteOnExit() // backstop; eval/serialize free eagerly
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    try { var i = 0; while (i < n) { out.writeDouble(inMem(i)); i += 1 } }
    finally out.close()
    runs += ((f, n.toLong))
    PercentileBuf.spilledBytes.add(8L * n)
    n = 0
  }

  /** Adopt everything from `other`: spilled runs move wholesale (file
    * ownership transfers, no re-read), the in-memory tail value by value.
    */
  def absorb(other: PercentileBuf): Unit = {
    runs ++= other.runs
    other.runs.clear()
    var i = 0
    while (i < other.n) { add(other.inMem(i)); i += 1 }
    other.n = 0
  }

  /** Stream every held value (unsorted across sources) to `f`. */
  def foreachValue(f: Double => Unit): Unit = {
    var i = 0
    while (i < n) { f(inMem(i)); i += 1 }
    runs.foreach { case (file, cnt) =>
      val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file), 1 << 16))
      try { var j = 0L; while (j < cnt) { f(in.readDouble()); j += 1 } }
      finally in.close()
    }
  }

  /** Exact interpolated percentiles (built-in `percentile` arithmetic:
    * lower + (higher − lower) · frac at the 0-based sorted order index
    * p·(total−1)) via one streaming k-way merge over the sorted runs +
    * the sorted in-memory tail. Frees the run files afterwards.
    */
  def percentiles(ps: Array[Double]): Array[Double] = {
    val tot = total
    require(tot > 0, "percentiles of an empty buffer")
    java.util.Arrays.sort(inMem, 0, n)
    val wanted: Array[Long] = ps
      .flatMap { p =>
        val idx = p * (tot - 1)
        Array(math.floor(idx).toLong, math.ceil(idx).toLong)
      }
      .distinct.sorted
    val at = new java.util.HashMap[Long, java.lang.Double]()
    final class Src(val next: () => Double, var remaining: Long) {
      var head: Double = _
      def advance(): Unit = { head = next(); remaining -= 1 }
    }
    val streams = ArrayBuffer.empty[DataInputStream]
    val heap = new java.util.PriorityQueue[Src](
      math.max(1, runs.length + 1),
      (a: Src, b: Src) => java.lang.Double.compare(a.head, b.head))
    var memIdx = 0
    val memSrc = new Src(() => { val v = inMem(memIdx); memIdx += 1; v }, n.toLong)
    if (memSrc.remaining > 0) { memSrc.advance(); heap.offer(memSrc) }
    runs.foreach { case (file, cnt) =>
      val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file), 1 << 16))
      streams += in
      val s = new Src(() => in.readDouble(), cnt)
      if (s.remaining > 0) { s.advance(); heap.offer(s) }
    }
    try {
      var pos = 0L
      var w = 0
      while (w < wanted.length) {
        val s = heap.poll()
        if (pos == wanted(w)) { at.put(pos, s.head); w += 1 }
        if (s.remaining > 0) { s.advance(); heap.offer(s) }
        pos += 1
      }
    } finally {
      streams.foreach(_.close())
      free()
    }
    ps.map { p =>
      val idx = p * (tot - 1)
      val lo: Double = at.get(math.floor(idx).toLong)
      val hi: Double = at.get(math.ceil(idx).toLong)
      lo + (hi - lo) * (idx - math.floor(idx))
    }
  }

  def free(): Unit = { runs.foreach(_._1.delete()); runs.clear() }
}

/** `percentile_spill(value, ps)`: exact per-group interpolated
  * percentiles with a DISK-SPILLING buffer — drop-in arithmetic match
  * for the built-in `percentile(value, array(ps))` (nulls ignored, same
  * interpolation, proven equal in RobustStatsSpec), minus its
  * scale-fatal flaw: the built-in materializes every group's values
  * into ONE in-memory buffer that cannot spill. Here a group's values
  * stream through a [[PercentileBuf]] — bounded memory per group, runs
  * on executor-local disk, order statistics by streaming k-way merge.
  *
  * vs the sort-window selection form (the r5 RobustStats internals):
  * same exactness and spill-safety, but ONE shuffle of (group, value)
  * into a hash aggregate instead of a full WindowExec sort +
  * row_number + post-filter + second aggregation.
  */
case class SpillablePercentile(
    child: Expression, ps: Seq[Double], spillThreshold: Int = 1 << 20,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileBuf] with UnaryLike[Expression] {
  // update() reads the child as Double; both construction paths cast
  // the value child to double (the Column wrapper via .cast, the SQL
  // registry via an explicit Cast node — ImplicitCastInputTypes is
  // closed off to this package because AbstractDataType is private[sql])
  require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
    "percentile positions must be in [0, 1]")
  require(spillThreshold > 0)

  override def prettyName: String = "percentile_spill"
  override def nullable: Boolean = true
  override val dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): PercentileBuf =
    new PercentileBuf(spillThreshold)

  override def update(b: PercentileBuf, input: InternalRow): PercentileBuf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: PercentileBuf, other: PercentileBuf): PercentileBuf = {
    b.absorb(other)
    b
  }

  override def eval(b: PercentileBuf): Any =
    if (b.total == 0) null
    else new GenericArrayData(b.percentiles(ps.toArray))

  override def serialize(b: PercentileBuf): Array[Byte] = {
    // the full multiset must cross the exchange either way (exact
    // percentiles are not mergeable from summaries); stream it as raw
    // doubles — the same bytes the built-in ships for this step.
    // NOTE on the memory contract: this one allocation is per-PARTIAL
    // (8·values-in-this-task's-group-slice bytes), not per-group — the
    // spill-threshold bound holds while accumulating, but the exchange
    // step materializes each partial as one heap buffer and hard-fails
    // past ~268M values per partial. At 100 TB that bounds map-side
    // partial size, not group size; raise parallelism (smaller
    // per-task slices) if a single partial approaches the cap.
    val tot = b.total
    require(tot <= (Int.MaxValue - 16) / 8,
      s"partial percentile buffer too large to serialize ($tot values)")
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * tot.toInt)
    bb.putLong(tot)
    b.foreachValue(bb.putDouble(_))
    b.free()
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PercentileBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val total = bb.getLong()
    val b = new PercentileBuf(spillThreshold)
    var i = 0L
    while (i < total) { b.add(bb.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SpillablePercentile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpillablePercentile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SpillablePercentile =
    copy(child = c)
}

object SpillablePercentile {
  /** Column-facing constructor: `agg(value, Seq(0.25, 0.5, 0.75))`.
    * Casts the value to double (the buffer's element type) so integral
    * columns work directly, like the built-in.
    */
  def agg(value: Column, ps: Seq[Double],
      spillThreshold: Int = 1 << 20): Column =
    ColumnBridge.column(
      SpillablePercentile(ColumnBridge.expression(value.cast("double")), ps,
        spillThreshold).toAggregateExpression())
}
