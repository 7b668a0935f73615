package graft

import org.apache.spark.sql.functions._

/** DSIR importance weights (ops/Dsir.scala): the hashed-ngram
  * log-likelihood-ratio arithmetic against an exact in-JVM reference,
  * plus the partition-invariance the integer-micro formulation buys.
  */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private val B = 4096

  /** Reference bucket hash — mirrors Dsir.bucket (md5 hex prefix). */
  private def bucket(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 6)
    java.lang.Long.parseLong(hex, 16) % B
  }

  test("weights match an exact in-JVM reference on a hand-built corpus") {
    val docs = Seq(
      (1L, "apple banana apple", true),
      (2L, "banana cherry durian", true),
      (3L, "cherry durian durian elder", false),
      (4L, "elder fig grape apple", false))
    val df = docs.map { case (id, t, tgt) => (id, t, if (tgt) "en" else "de") }
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.Dsir.importanceWeights(
        df, "doc_id", "text", col("lang") === "en", numBuckets = B)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap

    // exact reference: same smoothing, same quotient-then-multiply
    // double fed to ln, same micro-nat rounding
    val toks = docs.flatMap { case (id, t, tgt) =>
      t.split(" ").map(w => (id, tgt, bucket(w))) }
    val rc = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tc = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    val (rTot, tTot) = (toks.size.toLong, toks.count(_._2).toLong)
    def ld(b: Long): Long = math.round(1e6 * math.log(
      ((tc(b) * 2 + 1).toDouble / (tTot * 2 + B)) *
        ((rTot * 2 + B).toDouble / (rc(b) * 2 + 1))))
    val wantW = toks.groupBy(_._1).view
      .mapValues(ts => (ts.size.toLong, ts.map(t => ld(t._3)).sum)).toMap
    val (slw, sn) = (wantW.values.map(_._2).sum, wantW.values.map(_._1).sum)
    for ((id, (n, lw)) <- wantW) {
      assert(got(id)._1 === n, s"doc $id token count")
      assert(got(id)._2 === lw, s"doc $id logw_micro")
      assert(got(id)._3 === (lw.toDouble / n > slw.toDouble / sn),
        s"doc $id selection vs corpus mean")
    }
    // target docs must outscore non-target on this separated vocab
    val perTok = (id: Long) => got(id)._2.toDouble / got(id)._1
    assert(Seq(1L, 2L).map(perTok).min > Seq(3L, 4L).map(perTok).max,
      "target docs score above non-target docs")
  }

  test("weights are invariant to input partitioning (integer sums)") {
    val docs = graft.sources.Tables.documents(spark, Sf0001)
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Dsir.importanceWeights(d, "doc_id", "text",
          col("lang") === "en")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val one = run(docs.coalesce(1))
    val many = run(docs.repartition(7))
    assert(one === many, "logw_micro must not depend on partitioning")
    assert(one.nonEmpty && one.values.exists(_._2 != 0L))
  }
}
