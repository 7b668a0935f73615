package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 probe (r14 verdict item 4): attribute q_embed_neardup's scale
  * cost. At 10× data (200k → 2M vectors) its wall grew 5.52× — the
  * steepest remaining funnel ratio after simjoin/semdedup. The query's
  * cost model has three corpus-dependent terms:
  *   (1) signature work: n · tables · planes · dim multiplies,
  *   (2) bucket exchange: n · tables rows × ~(4·dim+24) bytes,
  *   (3) candidate emission: Σ_buckets C(occupancy, 2) cosine evals.
  * The adaptive sizing (planes = ⌈log2(n/16)⌉, tables from the recall
  * model) grows BOTH planes and tables with n, so terms (1)(2) scale
  * n·log n-ish while term (3) is held ~linear by the occupancy target.
  * This prints the actual numbers at a given corpus: derived params,
  * bucket-count/occupancy stats, exact pre-filter emission mass
  * (Σ C(c,2) per table), and survivor counts — enough to name which
  * term the next decade hits first. Pure aggregation, no pair join.
  *
  * `runMain graft.tools.EmbedNeardupProbe [sfDir]`
  */
object EmbedNeardupProbe {
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
    val e = graft.sources.Tables.embeddings(s, dir)
    val scaled = e.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = e.select(col("vec_id"), col("embedding")).unionByName(scaled)
    val n = 2L * graft.sources.Tables.parquetRowCount(s, dir, "embeddings")
    val planes = math.max(8, math.min(20,
      math.ceil(math.log(n / 16.0) / math.log(2.0)).toInt))
    val pColl = 1.0 - math.acos(0.98) / math.Pi
    val pTable = math.pow(pColl, planes)
    val tables = math.max(4, math.min(12,
      math.ceil(math.log(0.03) / math.log(1.0 - pTable)).toInt))
    println(s"n=$n planes=$planes tables=$tables pTable=$pTable")
    val tableCols = (0 until tables).map { t =>
      struct(lit(t).as("t"),
        graft.ops.Similarity.hyperplaneSignature(
          col("embedding"), planes, 64, 42L + t).as("sig"))
    }
    val occ = corpus
      .select(explode(array(tableCols: _*)).as("b"))
      .groupBy(col("b.t").as("t"), col("b.sig").as("sig"))
      .agg(count(lit(1)).as("c"))
    val stats = occ.groupBy(col("t")).agg(
      count(lit(1)).as("n_buckets"),
      max(col("c")).as("max_occ"),
      avg(col("c")).as("mean_occ"),
      sum(col("c") * (col("c") - 1) / 2).as("emission_pairs"))
      .orderBy(col("t"))
    stats.collect().foreach(r =>
      println(s"table=${r.get(0)} buckets=${r.get(1)} max_occ=${r.get(2)} " +
        f"mean_occ=${r.getDouble(3)}%.2f emission_pairs=${r.get(4)}"))
    val total = occ.agg(sum(col("c") * (col("c") - 1) / 2)).head().get(0)
    println(s"total emission pairs across tables: $total")
    // survivors (distinct verified pairs) — the output mass
    val pairs = graft.ops.Dedup.embeddingNearDupPairs(corpus, "embedding",
      "vec_id", numPlanes = planes, threshold = 0.98, numTables = tables)
    println(s"verified distinct pairs: ${pairs.count()}")
    spark.stop()
  }
}
