package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin
import graft.sources.Tables

class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private val Depth = 5
  private val Width = 4096
  private val Seed = 42L

  private def tokens = Tables.documents(spark, Sf001)
    .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    .filter(length(col("tok")) > 0)

  test("one-sided error: estimate >= true always, <= true + 3eN/w on every probed token") {
    val toks = tokens.cache()
    try {
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val n = toks.count()
      val sketch = toks.agg(CountMin.agg(col("tok"), Depth, Width, Seed).as("s"))

      // probe every distinct token (small-vocab corpus ⇒ full audit)
      val probed = exact.crossJoin(broadcast(sketch))
        .select(col("tok"), col("n"),
          CountMin.estimate(col("s"), col("tok"), Depth, Width, Seed).as("est"))
        .as[(String, Long, Long)].collect()
      assert(probed.nonEmpty)
      val under = probed.filter { case (_, t, e) => e < t }
      assert(under.isEmpty, s"count-min can NEVER underestimate: ${under.take(5).toSeq}")
      val cap = 3.0 * math.E / Width * n
      val over = probed.filter { case (_, t, e) => e > t + cap }
      assert(over.isEmpty,
        s"estimates beyond true + 3eN/w (=${cap.toLong}): ${over.take(5).toSeq}")
      // and the sketch is actually tight in aggregate, not just bounded
      val meanOver = probed.map { case (_, t, e) => (e - t).toDouble }.sum / probed.length
      assert(meanOver < cap / 3.0, s"mean overestimate $meanOver vs single-query cap $cap")
    } finally toks.unpersist()
  }

  test("counters are pure sums: sketch identical under any partitioning") {
    val a = tokens.repartition(7)
      .agg(CountMin.agg(col("tok"), Depth, Width, Seed)).as[Seq[Long]].head()
    val b = tokens.repartition(3)
      .agg(CountMin.agg(col("tok"), Depth, Width, Seed)).as[Seq[Long]].head()
    assert(a === b)
    assert(a.sum === tokens.count() * Depth)
  }
}
