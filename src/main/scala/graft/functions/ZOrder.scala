package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) clustering kernels.
  *
  * Multi-dimensional data skipping: a file sorted on `x` alone has
  * tight per-file min/max on `x` but every file spans all of `y`, so a
  * `y` predicate prunes nothing. Interleaving the bits of the columns'
  * QUANTILE RANKS (not raw values — ranks make the curve scale-free
  * and skew-proof) gives a space-filling curve; range-partitioning and
  * sorting by the curve key makes every file a small hyper-rectangle,
  * so min/max footer stats become selective on EVERY clustered column
  * (parquet row-group stats and file-level skipping both feed on
  * exactly these bounds). This is the layout behind OPTIMIZE ZORDER in
  * lakehouse table formats, built here from a codegen'd expression +
  * `repartitionByRange` — no format extension needed.
  */
object ZOrderKernels extends Serializable {

  /** Spread the low 32 bits of x so bit i lands at position 2i. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Rank of v among sorted bounds — count of bounds <= v, by binary
    * search. O(log bins) per row, ties collapse to the same bin.
    */
  def bin(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}

/** `quantile_bin(x)`: x's rank among precomputed quantile boundaries. */
case class QuantileBin(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_bin"
  override def nullSafeEval(v: Any): Any =
    ZOrderKernels.bin(v.asInstanceOf[Double], bounds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrderKernels.bin($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): QuantileBin =
    copy(child = c)
}

/** `interleave_bits(a, b)`: 2-d Morton key from two ≤32-bit ranks. */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKernels.interleave2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)
}

object zorder {
  def quantile_bin(c: Column, bounds: Array[Double]): Column =
    ColumnBridge.column(QuantileBin(ColumnBridge.expression(c), bounds))
  def interleave_bits(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
