package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 funnel diagnostics: bucket-size distributions for the three
  * CPU-superlinear funnels (r11 probe record), so the heavy-bucket cap
  * and sub-refinement strategy are sized from data, not guesses.
  */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/sfgen/k300")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def dist(name: String, counts: org.apache.spark.sql.DataFrame): Unit = {
      // counts: one row per bucket with column n
      val d = counts.agg(
        count(lit(1)).as("buckets"),
        sum(col("n")).as("rows"),
        max(col("n")).as("max_n"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs"),
        sum(when(col("n") > 256, col("n") * (col("n") - 1) / 2).otherwise(0L)).as("pairs_gt256"),
        sum(when(col("n") > 1024, col("n") * (col("n") - 1) / 2).otherwise(0L)).as("pairs_gt1024"),
        sum(when(col("n") > 256, col("n")).otherwise(0L)).as("rows_gt256"),
        sum(when(col("n") > 1024, col("n")).otherwise(0L)).as("rows_gt1024")
      ).collect()(0)
      println(s"== $name: $d")
    }

    if (args.lift(1).forall(_.contains("minhash"))) {
      val p = graft.ops.Dedup.MinhashParams()
      val sigged = graft.sources.Tables.spreadForKernel(docs).select(
        col("doc_id").as("id"),
        graft.functions.exprs.minhash_sig(col("text"), p.shingleN, p.numHashes, p.seed).as("sig"))
      val bandCols = (0 until p.bands).map { i =>
        struct(lit(i).as("band"),
          xxhash64(slice(col("sig"), i * p.rowsPerBand + 1, p.rowsPerBand)).as("bh"))
      }
      val buckets = sigged
        .select(col("id"), explode(array(bandCols: _*)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
      dist("minhash band buckets",
        buckets.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n")))
    }

    if (args.lift(1).forall(_.contains("substr"))) {
      val minLen = 40; val stride = 8
      val w = math.min(math.max(stride, 1), minLen - 1)
      val m = minLen - w + 1
      val anchors = graft.sources.Tables.spreadForKernel(docs)
        .filter(length(col("text")) >= minLen)
        .select(col("doc_id").as("id"),
          explode(graft.functions.exprs.winnow_anchors(
            graft.functions.exprs.gram_hashes64(col("text"), m), w)).as("a"))
        .select(col("id"), (col("a.p") + 1).as("p"), col("a.h").as("h"))
      dist("substr anchor buckets (by h)",
        anchors.groupBy(col("h")).agg(count(lit(1)).as("n")))
      dist("substr per-(id,h) multiplicity",
        anchors.groupBy(col("id"), col("h")).agg(count(lit(1)).as("n")))
      // doc-level: distinct docs per anchor hash
      dist("substr docs-per-hash",
        anchors.select(col("id"), col("h")).distinct()
          .groupBy(col("h")).agg(count(lit(1)).as("n")))
    }

    if (args.lift(1).forall(_.contains("prefix"))) {
      val tau = 0.8
      val heavyRows = graft.sources.Tables.spreadForKernel(docs)
        .filter(pmod(xxhash64(col("doc_id")), lit(20)) === 0)
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
      val bcKeys = spark.sparkContext.broadcast(heavySorted.map(_._1))
      val bcRanks = spark.sparkContext.broadcast(heavySorted.map(_._2))
      val keyed = graft.sources.Tables.spreadForKernel(docs)
        .select(col("doc_id"),
          graft.functions.BroadcastRank.heavyRankOrder(array_distinct(
              graft.functions.exprs.gram_hashes64(col("text"), 12)),
            bcKeys, bcRanks).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("m"), col("toks"))
        .select(col("doc_id"), col("m"),
          expr(s"slice(toks, 1, m - cast(ceil($tau * m) as int) + 1)").as("ptoks"))
      val prefixes = keyed
        .select(col("doc_id"), posexplode(col("ptoks")).as(Seq("pos", "pg")))
      dist("prefix pg buckets",
        prefixes.groupBy(col("pg")).agg(count(lit(1)).as("n")))
    }

    spark.stop()
  }
}
