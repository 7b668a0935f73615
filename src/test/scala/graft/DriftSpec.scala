package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("psiDrift: identical distributions score exactly zero") {
    // equal counts on both sides in every bin ⇒ equal totals ⇒ the
    // smoothed quotients are the SAME exact-integer divides ⇒ p̂ = q̂
    // bit-for-bit, every contribution 0, psi 0, no flag
    val df = Seq.tabulate(200)(i => (i % 100 * 1.0, i % 2 == 0))
      .toDF("value", "r")
    val out = Drift.psiDrift(df, "value", col("r"))
      .select("bin", "contrib_micro", "psi_micro", "drift_flag")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length === 10)
    assert(out.forall(_._2 === 0L), "identical dists: every term zero")
    assert(out.forall(_._3 === 0L))
    assert(out.forall(!_._4))
  }

  test("psiDrift: a major shift crosses the 0.2 flag; terms non-negative") {
    // reference concentrated low, current concentrated high — the
    // textbook "retrain gate fires" case
    val ref = Seq.fill(500)((5.0, true))
    val cur = Seq.fill(500)((95.0, false))
    val out = Drift.psiDrift((ref ++ cur).toDF("value", "r"), "value", col("r"))
      .select("bin", "ref_cnt", "cur_cnt", "contrib_micro", "psi_micro",
        "drift_flag")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    assert(out.length === 10, "empty bins present via the spine")
    assert(out(0)._2 === 500L && out(0)._3 === 0L)
    assert(out(9)._2 === 0L && out(9)._3 === 500L)
    assert(out.forall(_._4 >= 0L), "every PSI term is non-negative")
    assert(out.head._5 > 200000L && out.forall(_._6), "major shift flags")
    assert(out.map(_._4).sum === out.head._5, "total = sum of terms")
  }

  test("psiDrift: hand-computed two-bin check") {
    // ref: 3 in bin0, 1 in bin1 (+ 8 empty bins); cur: 1 in bin0, 3 in
    // bin1. p̂0 = (2·3+1)/(2·4+10) = 7/18, q̂0 = 3/18; term0 =
    // (7/18−3/18)·ln(7/3) ≈ 0.188270; term1 symmetric. Values checked
    // against an independent computation (not the engine's own code).
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (11.0, true),
      (4.0, false), (12.0, false), (13.0, false), (14.0, false))
      .toDF("value", "r")
    val out = Drift.psiDrift(df, "value", col("r"))
      .select("bin", "contrib_micro", "psi_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val expected = math.round(1e6 *
      (7.0 / 18 - 3.0 / 18) * math.log((7.0 / 18) * (18.0 / 3)))
    assert(out(0)._2 === expected)
    assert(out(1)._2 === expected, "mirror-image bin: same term")
    // untouched bins: both smoothed to 1/18 — exact zero
    assert(out.drop(2).forall(_._2 === 0L))
    assert(out(0)._3 === 2 * expected)
  }

  test("psiDrift: deterministic under repartitioning") {
    val ev = graft.sources.Tables.events(spark, Sf001)
    val ref = col("ts") < lit("2024-01-16").cast("timestamp")
    val a = Drift.psiDrift(ev, "value", ref).orderBy("bin").collect()
    val b = Drift.psiDrift(ev.repartition(13), "value", ref)
      .orderBy("bin").collect()
    assert(a.toSeq === b.toSeq)
  }
}
