package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: (pg, sk) bucket histogram of q_simjoin_prefix's refined
  * prefix stream — Σ C(r,2) over buckets is the join's emission count,
  * the denominator for the per-emission CPU cost of the heavy stage.
  * `runMain graft.tools.SimjoinProbe [sfDir]`.
  */
object SimjoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("sfgen/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val srcDocs = graft.sources.Tables.documents(s, dir)
    val heavyRows = graft.sources.Tables.spreadForKernel(srcDocs)
      .filter(substring(md5(concat(lit("rankmap:"),
        col("doc_id").cast("string"))), 1, 2) < lit("0d"))
      .select(explode(array_distinct(
        graft.functions.exprs.gram_hashes64(col("text"), 12))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .orderBy(col("c").desc, col("g")).limit(2000000)
      .collect()
    val heavySorted = heavyRows
      .map(r => (r.getLong(0), (63 - java.lang.Long.numberOfLeadingZeros(
        r.getLong(1))).toByte))
      .sortBy(_._1)
    val bcKeys = s.sparkContext.broadcast(heavySorted.map(_._1))
    val bcRanks = s.sparkContext.broadcast(heavySorted.map(_._2))
    val tau = 0.8
    val keyed = graft.sources.Tables.spreadForKernel(srcDocs)
      .select(col("doc_id"),
        graft.functions.BroadcastRank.heavyRankOrder(array_distinct(
            graft.functions.exprs.gram_hashes64(col("text"), 12)),
          bcKeys, bcRanks).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("m"), col("toks"))
      .select(col("doc_id"), col("m"),
        expr(s"slice(toks, 1, m - cast(ceil($tau * m) as int) + 1)")
          .as("ptoks"),
        graft.functions.exprs.sig_digest(
          graft.functions.exprs.minhash_sig_l(col("toks"), 64, 42L)).as("dg"))
    val prefixStream = keyed
      .select(col("doc_id"), col("dg"), posexplode(col("ptoks")).as(Seq("pos", "pg")))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    for (w <- Seq(2, 3)) {
      val refined = prefixStream
        .select(col("pg"),
          explode(graft.ops.BucketRefine.subkeysWide(col("dg"), 64, w,
            graft.functions.BroadcastRank.heavyRankAtLeast(
              col("pg"), bcKeys, bcRanks, 2))).as("sk"))
      val hist = refined.groupBy(col("pg"), col("sk"))
        .agg(count(lit(1)).as("r"), max(col("sk") === -1L).as("light"))
        .selectExpr("count(*) as buckets", "sum(r) as rows",
          "sum(r*(r-1) div 2) as emissions", "max(r) as max_bucket",
          "sum(case when light then r*(r-1) div 2 else 0 end) as em_light",
          "sum(case when not light then r*(r-1) div 2 else 0 end) as em_heavy")
        .head()
      println(s"DIR=$dir width=$w buckets=${hist.getLong(0)} rows=${hist.getLong(1)} " +
        s"emissions=${hist.getAs[Number](2).longValue} " +
        s"max_bucket=${hist.getAs[Number](3).longValue} " +
        s"em_light=${hist.getAs[Number](4).longValue} " +
        s"em_heavy=${hist.getAs[Number](5).longValue}")
    }
    spark.stop()
  }
}
