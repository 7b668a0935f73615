package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: why does the prefix stream's heavy flag never fire?
  * Prints (a) prefix rows split by heavyRankAtLeast(pg, 2), (b) the
  * top-15 pg buckets by PREFIX occupancy with their sampled-count rank
  * and flag, (c) the bucket-size histogram of the emission mass.
  * `runMain graft.tools.SimjoinFlagProbe [sfDir]`.
  */
object SimjoinFlagProbe {
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
    println(s"rank-map entries: ${heavyRows.length}; top counts: " +
      heavyRows.take(5).map(r => r.getLong(1)).mkString(","))
    val heavySorted = heavyRows
      .map(r => (r.getLong(0), (63 - java.lang.Long.numberOfLeadingZeros(
        r.getLong(1))).toByte))
      .sortBy(_._1)
    val bcKeys = s.sparkContext.broadcast(heavySorted.map(_._1))
    val bcRanks = s.sparkContext.broadcast(heavySorted.map(_._2))
    val rankByKey = heavySorted.toMap
    val tau = 0.8
    val keyed = graft.sources.Tables.spreadForKernel(srcDocs)
      .select(col("doc_id"),
        graft.functions.BroadcastRank.heavyRankOrder(array_distinct(
            graft.functions.exprs.gram_hashes64(col("text"), 12)),
          bcKeys, bcRanks).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("m"), col("toks"))
      .select(col("doc_id"),
        expr(s"slice(toks, 1, m - cast(ceil($tau * m) as int) + 1)")
          .as("ptoks"))
    val prefix = keyed
      .select(explode(col("ptoks")).as("pg"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val flagged = prefix.select(
        graft.functions.BroadcastRank.heavyRankAtLeast(
          col("pg"), bcKeys, bcRanks, 2).as("h"))
      .groupBy(col("h")).count().collect()
    flagged.foreach(r => println(s"heavy=${r.getBoolean(0)} prefixRows=${r.getLong(1)}"))
    val top = prefix.groupBy(col("pg")).count()
      .orderBy(col("count").desc).limit(15).collect()
    top.foreach { r =>
      val g = r.getLong(0)
      println(s"pg=$g prefixBucket=${r.getLong(1)} sampledRank=${rankByKey.get(g)}")
    }
    val hist = prefix.groupBy(col("pg")).count()
      .select(when(col("count") >= 128, 128)
        .otherwise(pow(lit(2), floor(log2(col("count")))).cast("long")).as("bin"),
        col("count"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("buckets"),
        sum(expr("count*(count-1) div 2")).as("emissions"))
      .orderBy(col("bin"))
      .collect()
    hist.foreach(r => println(
      s"binSize>=${r.getLong(0)} buckets=${r.getLong(1)} emissions=${r.getAs[Number](2).longValue}"))
    spark.stop()
  }
}
