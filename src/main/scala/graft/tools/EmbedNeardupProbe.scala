package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 probe (r15 verdict item 1): measure whether the
  * occupancy-TARGETED planes schedule (Dedup.occupancyPlanesSchedule)
  * bends q_embed_neardup's pre-filter pair-emission curve to the
  * ~n^1.1 envelope. The r15 probe named the mechanism (emission 19.6×
  * per 10× data: ceil-quantized occupancy 13.2 → 17.1 plus the skew
  * tail squared into ΣC(occ, 2)); this one runs the SAME bucket-stat
  * aggregation under the new schedule and prints, per corpus: derived
  * planes-per-table, bucket-count/occupancy stats, exact emission mass
  * Σ C(c, 2), verified distinct pairs, and PLANTED-PAIR RECALL (every
  * vector has a ×2-scaled copy at cosine ≈ 1 — the recall floor the
  * verdict requires re-proven).
  *
  * Probe ids: the scaled copy of vector v gets id v + idSpan where
  * idSpan = max(vec_id) + 1 AFTER replication — the r15 probe reused
  * the query's +10000 shift, which collides at probe corpora and made
  * the survivor count conflate distinct pairs sharing an (id_a, id_b)
  * key (r15 advisory item 3). The QUERY keeps its own +10000 shift at
  * oracle sfs (where it is collision-free) — this probe measures the
  * operator, not the query's id cosmetics.
  *
  * Third decade (sampled): `rep` > 1 replicates the base corpus rep×
  * with seeded coordinate permutations (the ScaleGen recipe —
  * permuted vectors sign independently, so buckets decorrelate across
  * replicas) before the ×2-scale doubling. At rep = 10 on the k1000
  * corpus that is 40M self-join vectors; pass emissionOnly = true to
  * skip the O(emission) verify join and measure the curve alone.
  *
  * `runMain graft.tools.EmbedNeardupProbe [sfDir] [outJson] [rep] [emissionOnly]`
  */
object EmbedNeardupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("sfgen/sf10")
    val out = if (args.length > 1) Some(args(1)) else None
    val rep = if (args.length > 2) args(2).toInt else 1
    val emissionOnly = args.length > 3 && args(3).toBoolean
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val e0 = graft.sources.Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val nVec = graft.sources.Tables.parquetRowCount(s, dir, "embeddings")
    val dim = 64
    // replicas: seeded coordinate permutations, ids shifted by nVec
    val perms: Array[Array[Int]] = (0 until rep).map { i =>
      if (i == 0) (0 until dim).toArray
      else new scala.util.Random(9001L + i)
        .shuffle((0 until dim).toVector).toArray
    }.toArray
    val permute = udf { (v: Seq[Float], r: Int) =>
      if (r == 0) v else { val p = perms(r); p.toSeq.map(v) }
    }
    val base =
      if (rep == 1) e0
      else (0 until rep).map { i =>
        e0.select((col("vec_id") + lit(i * nVec)).as("vec_id"),
          permute(col("embedding"), lit(i)).as("embedding"))
      }.reduce(_ unionAll _)
    val idSpan = rep.toLong * nVec
    val scaled = base.select((col("vec_id") + lit(idSpan)).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = base.unionByName(scaled)
    val n = 2L * idSpan
    val schedule = graft.ops.Dedup.occupancyPlanesSchedule(
      n, targetOcc = 8.0, theta = 0.98, extraBits = 2.0)
    val tables = schedule.length
    // args(4) "lo-hi": restrict the STATS aggregation to schedule
    // tables lo..hi (global indices) — each table's bucket counts are
    // an independent measurement, but a single session RETAINS every
    // job's shuffle files until app exit, so the 40M-vector leg's
    // 14-table stats (~2 skinny exchanges × 560M bucket rows) exceed
    // this one-volume host's headroom in one JVM. The driver script
    // runs chunks in separate JVMs (files freed between) and sums.
    // Seeds stay global: chunk planes = schedule.slice, seed 42+lo,
    // and t relabeled +lo, so chunked stats are bitwise the tables
    // they'd be in the full run.
    val (tLo, tHi) = if (args.length > 4 && args(4).nonEmpty) {
      val a = args(4).split("-"); (a(0).toInt, math.min(a(1).toInt, tables - 1))
    } else (0, tables - 1)
    val chunk = schedule.slice(tLo, tHi + 1)
    println(s"n=$n rep=$rep schedule=${schedule.mkString(",")} tables=$tables" +
      s" statsTables=$tLo-$tHi")
    val nParts = graft.ops.Dedup.sizedShufflePartitions(
      n * tables, 500000L, 32, 200)
    // stats over the EXACT join keys (t, sig, ext) — occupancy-cap
    // sub-buckets included — via the same embeddingBuckets the query's
    // pair join consumes. numPartitions = 0: the stats path must NOT
    // repartition the vector-carrying rows (the aggregations only need
    // the skinny partial-agg exchanges; the r16 first run's sized
    // repartition here wrote a corpus-scale shuffle that ENOSPC'd the
    // 4M leg alongside the verify phase's staged cache).
    val occ = graft.ops.Dedup.embeddingBuckets(corpus, "embedding",
        "vec_id", chunk, 42L + tLo, dim, 0, splitOcc = 16, splitTarget = 8)
      .groupBy((col("t") + lit(tLo)).as("t"), col("sig"), col("ext"))
      .agg(count(lit(1)).as("c"))
    val stats = occ.groupBy(col("t")).agg(
      count(lit(1)).as("n_buckets"),
      max(col("c")).as("max_occ"),
      avg(col("c")).as("mean_occ"),
      sum(expr("c * (c - 1) DIV 2")).as("emission_pairs"))
      .orderBy(col("t")).collect()
    // Emission share by occupancy band (all tables pooled): how much of
    // ΣC(occ,2) lives in over-cap buckets — the mass an occupancy cap
    // (extra-signature-bit bucket split) can attack, vs the sub-cap
    // mass the planes schedule already holds linear.
    val bands = occ.select(
      when(col("c") <= 16, "a<=16").when(col("c") <= 64, "b17-64")
        .when(col("c") <= 256, "c65-256").when(col("c") <= 1024, "d257-1024")
        .otherwise("e>1024").as("band"),
      expr("c * (c - 1) DIV 2").as("em"))
      .groupBy("band").agg(count(lit(1)).as("n_buckets"), sum("em").as("emission"))
      .orderBy("band").collect()
    bands.foreach { r =>
      println(s"band=${r.getString(0)} buckets=${r.getLong(1)} " +
        s"emission=${r.getLong(2)}")
    }
    val perTable = stats.map { r =>
      val m = Map(
        "t" -> r.getAs[Any]("t"), "planes" -> schedule(r.getAs[Int]("t")),
        "buckets" -> r.getAs[Any]("n_buckets"),
        "max_occ" -> r.getAs[Any]("max_occ"),
        "mean_occ" -> math.rint(r.getAs[Double]("mean_occ") * 100) / 100,
        "emission_pairs" -> r.getAs[Any]("emission_pairs"))
      println(m)
      m
    }
    val total = perTable.map(_("emission_pairs").asInstanceOf[Long]).sum
    val meanOcc =
      perTable.map(_("mean_occ").asInstanceOf[Double]).sum / perTable.length
    println(s"total emission pairs across tables $tLo-$tHi: $total " +
      s"(mean occ $meanOcc)")
    var verified = -1L
    var plantedFound = -1L
    if (!emissionOnly) {
      val pairs = graft.ops.Dedup.embeddingNearDupPairs(corpus, "embedding",
        "vec_id", schedule, 0.98, 42L, dim, nParts,
        splitOcc = 16, splitTarget = 8, stageBuckets = true)
      val agg = pairs.agg(count(lit(1)),
        sum(when(col("id_b") === col("id_a") + lit(idSpan), 1L)
          .otherwise(0L))).head()
      verified = agg.getLong(0)
      plantedFound = agg.getLong(1)
      println(s"verified distinct pairs: $verified; planted recall: " +
        s"$plantedFound/$idSpan = ${plantedFound.toDouble / idSpan}")
    }
    out.foreach { p =>
      val json = new StringBuilder
      json ++= "{"
      json ++= s""""n": $n, "rep": $rep, "id_span": $idSpan, """
      json ++= s""""schedule": [${schedule.mkString(",")}], """
      json ++= s""""tables": $tables, """
      json ++= s""""stats_tables": "$tLo-$tHi", """
      json ++= s""""mean_occ": ${math.rint(meanOcc * 100) / 100}, """
      json ++= s""""total_emission_pairs": $total, """
      json ++= s""""verified_pairs": $verified, """
      json ++= s""""planted_pairs": $idSpan, """
      json ++= s""""planted_found": $plantedFound, """
      json ++= perTable.map(m =>
        s"""{"t": ${m("t")}, "planes": ${m("planes")}, "buckets": ${m("buckets")}, """ +
          s""""max_occ": ${m("max_occ")}, "mean_occ": ${m("mean_occ")}, """ +
          s""""emission_pairs": ${m("emission_pairs")}}""")
        .mkString("\"per_table\": [", ", ", "]")
      json ++= "}"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        json.toString.getBytes("UTF-8"))
      println(s"wrote $p")
    }
    spark.stop()
  }
}
