package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: is pmod(xxhash64(id), 20) === 0 uniform over a doc_id
  * range, and over the SPECIFIC docs carrying one gram?
  * `runMain graft.tools.SampleUniformityCheck <sfDir> <pg> <lo> <hi>`
  */
object SampleUniformityCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("sfgen/sf10")
    val pg = args.lift(1).getOrElse("2516285594203901149").toLong
    val lo = args.lift(2).getOrElse("300002").toLong
    val hi = args.lift(3).getOrElse("304963").toLong
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    // 1) synthetic range: the filter over consecutive longs
    val r = s.range(lo, hi + 1)
      .agg(count(lit(1)).as("n"),
        sum(when(pmod(xxhash64(col("id")), lit(20)) === 0, 1L).otherwise(0L)).as("ns"))
      .head()
    println(s"range [$lo,$hi]: n=${r.getLong(0)} sampled=${r.getLong(1)}")
    // 2) the gram's actual docs: their ids and sample flags
    val srcDocs = graft.sources.Tables.documents(s, dir)
    val docs = graft.sources.Tables.spreadForKernel(srcDocs)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.exprs.gram_hashes64(col("text"), 12))).as("g"))
      .filter(col("g") === pg)
      .select(col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(20)).as("pm"),
        (substring(md5(concat(lit("rankmap:"), col("doc_id").cast("string"))),
          1, 2) < lit("0d")).as("md"))
      .orderBy(col("doc_id")).collect()
    println(s"gram $pg docs=${docs.length} xxsampled=${docs.count(_.getLong(1) == 0L)}" +
      s" mdsampled=${docs.count(_.getBoolean(2))}")
    println("first 30 (doc_id, pmod, md): " + docs.take(30)
      .map(r => s"(${r.getLong(0)},${r.getLong(1)},${r.getBoolean(2)})").mkString(" "))
    // 3) doc_id step structure: are they strided?
    val ids = docs.map(_.getLong(0))
    val diffs = ids.sliding(2).map(a => a(1) - a(0)).toArray
    println("id diffs histogram: " + diffs.groupBy(identity).toSeq
      .sortBy(_._1).take(10).map { case (d, xs) => s"$d->${xs.length}" }.mkString(" "))
    spark.stop()
  }
}
