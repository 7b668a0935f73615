package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(0.8f, 0.2f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val got = Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "qid", "qv", k = 3)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(got === Array(1L, 4L, 2L)) // cos: .9938, .9701, 0 (2 beats 3 by id)
  }

  test("bounded-heap top-k agrees with a window-rank reference on multi-partition data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val big = (0L until 400L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").repartition(7)
    val queries = big.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Similarity.bruteForceTopK(
        big, "vec_id", "embedding", queries, "qid", "qv", k = 7)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().sorted

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val want = big.crossJoin(broadcast(queries))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        round(graft.functions.exprs.cosine_f(col("embedding"), col("qv")), 9).as("cosine"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().sorted
    assert(got === want)
  }

  test("top-k plan is a partial ObjectHashAggregate, not a full-shuffle window") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val plan = Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "qid", "qv", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topk_by_score"))
    assert(!plan.contains("Window"))
  }

  test("lshTopK recall >= 0.8 vs brute force at sf0.01 with q_ann_lsh parameters") {
    val e = graft.sources.Tables.embeddings(spark, Sf001)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = ops.Similarity.bruteForceTopK(
        e, "vec_id", "embedding", queries, "qid", "qv", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = ops.Similarity.lshTopK(
        e, "vec_id", "embedding", queries, "qid", "qv",
        k = 5, numPlanes = 8, numTables = 6, probeHamming = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"ANN recall@5 over 20 queries: $recall%.3f")
    assert(exact.size === 100)
    assert(recall >= 0.8)
  }

  test("ivfTopK recall >= 0.9 on blob-structured embeddings (its design target)") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val blobs = (0 until 20).map(_ => Array.fill(dim)(rnd.nextGaussian() * 10))
    val corpus = (0L until 2000L).map { i =>
      val c = blobs((i % 20).toInt)
      (i, c.map(v => (v + rnd.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    val exact = Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "qid", "qv", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(
        corpus, "vec_id", "embedding", queries, "qid", "qv",
        k = 5, numCells = 20, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@5, 20 blobs, nProbe=3/20: $recall%.3f")
    assert(recall >= 0.9)
  }

  test("lshTopK returns a subset of brute-force candidates with exact scores") {
    val queries = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val lsh = Similarity.lshTopK(
        corpus, "vec_id", "embedding", queries, "qid", "qv",
        k = 3, numPlanes = 4, dim = 3)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
    val bf = Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "qid", "qv", k = 4)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
    // LSH candidates carry the exact cosine of the brute-force path
    lsh.foreach { case (id, c) => assert(math.abs(c - bf(id)) < 1e-12) }
    // near-parallel vectors (6°/14° from the query) share its bucket
    assert(lsh.contains(1L) && lsh.contains(4L))
  }
}
