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
