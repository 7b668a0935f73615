package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Explain the minhash banding-join candidate sub-plan (the piece the
  * checkpointed query hides from ExplainQuery) — diagnostic for
  * exchange reuse on the self-join.
  */
object ExplainFunnel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exprs = graft.functions.exprs
    val docs = graft.sources.Tables.documents(spark, dir)
    val p = graft.ops.Dedup.MinhashParams()
    val sigged = graft.sources.Tables.spreadForKernel(docs).select(
      col("doc_id").as("id"),
      exprs.minhash_sig(col("text"), p.shingleN, p.numHashes, p.seed).as("sig"))
    val bandCols = (0 until p.bands).map { i =>
      struct(lit(i).as("band"),
        xxhash64(slice(col("sig"), i * p.rowsPerBand + 1, p.rowsPerBand)).as("bh"))
    }
    val buckets = sigged
      .select(col("id"), exprs.sig_digest(col("sig")).as("dg"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("dg"), col("b.band").as("band"), col("b.bh").as("bh"))
    val estCut = math.max(0.0,
      p.jaccardThreshold - p.estFilterSigmas / (2.0 * math.sqrt(p.numHashes.toDouble)))
    val a = buckets.as("a")
    val b = buckets.as("b")
    val useHint = args.lift(1).forall(_ == "hint")
    val aa = if (useHint) a.hint("shuffle_hash") else a
    val cand = aa.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .filter(exprs.digest_agree(col("a.dg"), col("b.dg")) >= estCut)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    if (args.lift(2).contains("run")) {
      val n = cand.count()
      println(s"count=$n")
      // scalastyle:off println
      println(cand.queryExecution.executedPlan.toString.take(4000))
    } else cand.explain("formatted")
    spark.stop()
  }
}
