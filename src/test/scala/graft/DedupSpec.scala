package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions.exprs

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest where nobody can find it anymore"

  // 0/1 near-identical (one word changed), 2 identical copy of 0, 3/4 unrelated
  private def docs = Seq(
    (0L, base),
    (1L, base.replace("green", "blue")),
    (2L, base),
    (3L, "completely different content about spark query engines and shuffles here"),
    (4L, "yet another unrelated document talking about benchmark numbers and planning")
  ).toDF("doc_id", "text")

  test("exactByText keeps min id per distinct text") {
    val rows = Dedup.exactByText(docs, "text", "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(rows === Set((0L, 2L), (1L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("exactByFingerprint agrees with exactByText on survivor count") {
    assert(Dedup.exactByFingerprint(docs, "text", "doc_id").count() === 4)
  }

  test("minhash LSH finds planted near-duplicates and exact copies") {
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        Dedup.MinhashParams(jaccardThreshold = 0.7))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)), "exact copy must be found")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L)),
      "near-dup (one-word edit) should collide in at least one band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dropNearDups keeps the smallest id of each dup group") {
    val kept = Dedup.dropNearDups(docs, "text", "doc_id",
        Dedup.MinhashParams(jaccardThreshold = 0.7))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.contains(3L) && kept.contains(4L))
    assert(!kept.contains(2L), "exact copy with larger id must be dropped")
  }

  test("simhash: identical texts get identical hashes, near-dups low hamming") {
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val exact = pairs.find(p => p._1 == 0L && p._2 == 2L)
    assert(exact.exists(_._3 === 0), "identical docs must have hamming 0")
  }

  test("embedding near-dup finds identical vectors via LSH buckets") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.05f, 0.0f, 0.0f)), // near-dup of 0
      (2L, Array(-1.0f, 0.2f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, "embedding", "vec_id",
        numPlanes = 6, threshold = 0.95, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("jaccard_sorted merge-walk matches set arithmetic") {
    val df = Seq((Array(1, 2, 3, 4), Array(3, 4, 5, 6))).toDF("a", "b")
    val j = df.select(exprs.jaccard_sorted(col("a"), col("b"))).as[Double].head()
    assert(math.abs(j - 2.0 / 6.0) < 1e-12)
  }
}
