package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Auto-rewrite of point-in-interval joins to the binned equi-join form
  * of [[graft.ops.RangeJoin]] — as an optimizer rule, so a user who
  * writes the NAIVE condition
  *
  *   points.join(ivals, pt >= lo && pt <= hi && keys...)
  *
  * (which Spark plans as BroadcastNestedLoopJoin — O(|points|·|ivals|)
  * per executor, the plan that cannot run at 100 TB) transparently gets
  * the hash-join plan instead. The rewrite:
  *
  *   point side    + __graft_bin = floordiv(pt, w)
  *   interval side + explode(sequence(floordiv(lo, w), floordiv(hi, w)))
  *   join on (original equi keys…, __graft_bin), range predicates kept
  *   in the join condition (ExtractEquiJoinKeys plans them as the hash
  *   join's extra condition), original output restored by a Project.
  *
  * A (point, interval) pair matches in exactly one bin — the point's —
  * so no dedup is needed. Guards:
  *
  *   - only INNER joins with long-typed point/bound expressions (time
  *     axes are epoch millis/micros here; cast date/timestamp upstream);
  *   - the `__graft_bin` marker name blocks re-matching the rewritten
  *     join (the rule runs in a fixed-point batch);
  *   - off-switch `spark.graft.rangeJoin.enabled`; bin width
  *     `spark.graft.rangeJoin.binWidth` — size it near the typical
  *     interval span (explode factor = span/width + 1 rows per
  *     interval, so too-fine wastes shuffle, too-coarse wastes verify).
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`; RangeJoinRuleSpec proves naive-API parity and
  * the no-nested-loop plan.
  */
case class RangeJoinRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "__graft_bin"

  private def enabled: Boolean =
    session.conf.get("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def binWidth: Long =
    session.conf.get("spark.graft.rangeJoin.binWidth", "3600000").toLong

  /** floor(x / w) in exact long arithmetic ((x - pmod(x, w)) div w —
    * floor, not truncate-toward-zero, for negative axes; no double
    * rounding above 2^53).
    */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.output.exists(_.name == Marker) =>
        val conjuncts = splitConjunctivePredicates(cond)

        // normalize every inequality to (pt op bound): GreaterThanOrEqual
        // means pt >= bound (lower), LessThanOrEqual pt <= bound (upper)
        case class RangePred(pt: Expression, bound: Expression, lower: Boolean)
        def asRange(c: Expression): Option[RangePred] = c match {
          case GreaterThanOrEqual(a, b) => Some(RangePred(a, b, lower = true))
          case LessThanOrEqual(a, b)    => Some(RangePred(a, b, lower = false))
          case GreaterThan(a, b)        => Some(RangePred(a, b, lower = true))
          case LessThan(a, b)           => Some(RangePred(a, b, lower = false))
          case _                        => None
        }
        // keep only cross-side predicates, oriented so pt and bound each
        // reference exactly one (opposite) side
        def oriented(r: RangePred): Option[RangePred] =
          if (refsOnly(r.pt, left) && refsOnly(r.bound, right) ||
              refsOnly(r.pt, right) && refsOnly(r.bound, left)) Some(r)
          else None

        val ranges = conjuncts.flatMap(asRange).flatMap { r =>
          oriented(r).orElse(
            // bound-first spelling (lo <= pt): flip operands and sense
            oriented(RangePred(r.bound, r.pt, !r.lower)))
        }.filter(r => r.pt.dataType == LongType && r.bound.dataType == LongType)

        val lowers = ranges.filter(_.lower)
        val uppers = ranges.filter(!_.lower)
        // need one lower and one upper bound on the SAME point expression
        val pair = (for {
          lo <- lowers; hi <- uppers if lo.pt.semanticEquals(hi.pt)
        } yield (lo, hi)).headOption

        pair match {
          case Some((lo, hi)) =>
            val ptOnLeft = refsOnly(lo.pt, left)
            val (ptSide, ivSide) = if (ptOnLeft) (left, right) else (right, left)
            val w = binWidth

            val ptBinAlias = Alias(floorDiv(lo.pt, w), Marker)()
            val ptProj = Project(ptSide.output :+ ptBinAlias, ptSide)

            val ivBinAttr = AttributeReference(Marker, LongType, nullable = true)()
            // guard inverted intervals (hi < lo): the naive join matches
            // nothing there, but Sequence(start > stop, step +1) THROWS —
            // emit an empty bin array instead (row drops in the inner join)
            val loBin = floorDiv(lo.bound, w)
            val hiBin = floorDiv(hi.bound, w)
            val gen = Explode(If(
              LessThanOrEqual(loBin, hiBin),
              Sequence(loBin, hiBin, Some(Literal(1L)),
                Some(session.sessionState.conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long],
                org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))))
            val ivGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
              qualifier = None, generatorOutput = Seq(ivBinAttr), child = ivSide)

            val (newLeft, newRight) =
              if (ptOnLeft) (ptProj, ivGen) else (ivGen, ptProj)
            val binEq = EqualTo(ptBinAlias.toAttribute, ivBinAttr)
            val newCond = (conjuncts :+ binEq).reduce(And)
            Project(j.output,
              Join(newLeft, newRight, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
