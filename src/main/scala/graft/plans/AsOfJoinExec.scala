package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, CreateStruct, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge

/** The as-of join as a FIRST-CLASS physical operator — rung (c) of the
  * extension ladder: custom `LogicalPlan` node + planner `Strategy` +
  * `SparkPlan`, registered through the same extension points the
  * built-ins use. The compositional form ([[graft.ops.AsOfJoin]]) stays
  * the default; this operator exists where the union+window plan's cost
  * shape hurts: the window materializes BOTH sides into one sorted run
  * per key (left rows pay the sort of the interleaved union), and
  * `last(ignoreNulls)` walks every row. Here each side sorts
  * INDEPENDENTLY under its own declared requirement — Exchange and Sort
  * are inserted by EnsureRequirements exactly as for a SortMergeJoin —
  * and one forward merge walk per partition emits left rows with the
  * latest right row at-or-before, never materializing the union.
  *
  * Semantics (identical to AsOfJoin.leftAsOf, proven in AsOfExecSpec):
  * backward inclusive (rightTime <= leftTime), left outer (nulls when
  * no right row precedes), ties among equal (key, rightTime) resolved
  * to the greatest value tuple — enforced by the right side's required
  * SortOrder on struct(values), so determinism is a PLAN property, not
  * a runtime accident.
  *
  * The produced `asof_*` columns are carried as explicit output
  * attributes (`producedAttributes`), NOT as Alias expressions — the
  * analyzer's CleanupAliases pass strips aliases from every
  * non-Project/Aggregate/Window operator, custom nodes included.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValueExprs: Seq[Expression],
    asofAttrs: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofAttrs
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * `spark.experimental.extraStrategies` on a live session.
  */
case class AsOfJoinStrategy() extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, oa) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, oa) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValueExprs: Seq[Expression],
    asofAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  /** Both sides cluster on their key — EnsureRequirements inserts
    * compatible hash Exchanges (or reuses existing partitioning), the
    * same contract SortMergeJoinExec declares.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Right side additionally orders by the value struct so the merge's
    * "last consumed wins" IS the greatest-struct tie rule.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(CreateStruct.apply(rightValueExprs), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey; val rKeyExpr = rightKey
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val valExprs = rightValueExprs
    val outAttrs = output
    val joinSchema = lOut ++ asofAttrs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val rValProj = UnsafeProjection.create(valExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyExpr.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val outProj = UnsafeProjection.create(outAttrs, joinSchema)
      val nullVals = InternalRow.fromSeq(Seq.fill(valExprs.length)(null))
      val joined = new JoinedRow
      // one forward walk: rows arrive sorted by (key, time[, struct]),
      // so the last right row consumed at-or-before the current left
      // (key, time) is the match — O(|L| + |R|) per partition, zero
      // allocation beyond the held copies
      var pending: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var lastKey: UnsafeRow = null
      var lastVals: UnsafeRow = null
      lIter.map { lRow =>
        while (pending != null && {
            val c = keyOrd.compare(rKeyProj(pending), lKeyProj(lRow))
            c < 0 ||
              (c == 0 && timeOrd.compare(rTimeProj(pending), lTimeProj(lRow)) <= 0)
          }) {
          lastKey = rKeyProj(pending).copy()
          lastVals = rValProj(pending).copy()
          pending = if (rIter.hasNext) rIter.next().copy() else null
        }
        val matched =
          lastKey != null && keyOrd.compare(lastKey, lKeyProj(lRow)) == 0
        outProj(joined(lRow, if (matched) lastVals else nullVals))
      }
    }
  }
}

/** Column-facing entry point for the physical as-of join. */
object AsOfJoinPhysical {

  /** Idempotently install the planner strategy on a live session; the
    * config-time route is `spark.sql.extensions=graft.functions
    * .GraftExtensions`, which injects it at session build.
    */
  def ensure(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy()
  }

  /** Same signature and output schema as [[graft.ops.AsOfJoin.leftAsOf]]:
    * left columns plus `asof_<c>` for each value column.
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensure(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join never carries duplicate
    // attribute ids across the two children (the analyzer does this for
    // built-in Join nodes; a custom node does it itself)
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    val rOut = rAliases.map(_.toAttribute)
    def find(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${out.map(_.name)}"))
    val valueAttrs = valueCols.map(c => find(rOut, c))
    val asofAttrs = valueAttrs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val node = AsOfJoinNode(lPlan, rPlan,
      find(lPlan.output, keyCol), find(rOut, keyCol),
      find(lPlan.output, timeCol), find(rOut, timeCol),
      valueAttrs, asofAttrs)
    PlanBridge.dataFrame(spark, node)
  }
}
