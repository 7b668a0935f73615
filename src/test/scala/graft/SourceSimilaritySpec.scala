package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class SourceSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("identical sources estimate J = 1; disjoint sources estimate low") {
    val base = (0 until 20).map(i => s"the quick brown fox jumps over the lazy dog number $i")
    val other = (0 until 20).map(i => s"completely different content about spark shuffles and partitions $i")
    val docs = (base.map(("a", _)) ++ base.map(("mirror", _)) ++
      other.map(("z", _))).toDF("source", "text")
    val out = Dedup.sourceSimilarity(docs, "text", "source")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("a", "mirror")) === 1000000L,
      "identical shingle sets must agree on every permutation")
    assert(out(("a", "z")) < 500000L, "disjoint content must score low")
    assert(out(("mirror", "z")) === out(("a", "z")),
      "mirrors must be indistinguishable to every other source")
  }

  test("a source's signature is the min over the union of its docs' shingles") {
    // J(a, union) where union = a's docs + z's docs: the union source
    // contains every shingle of a, so each permutation's min over union
    // is <= a's min — and equals it exactly when a's min is the global
    // min. Structural check: J(union, a) and J(union, z) must both be
    // strictly positive while J(a, z) stays near zero.
    val aDocs = (0 until 10).map(i => s"alpha beta gamma delta epsilon zeta $i")
    val zDocs = (0 until 10).map(i => s"one two three four five six seven $i")
    val docs = (aDocs.map(("a", _)) ++ zDocs.map(("z", _)) ++
      (aDocs ++ zDocs).map(("u", _))).toDF("source", "text")
    val out = Dedup.sourceSimilarity(docs, "text", "source")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("a", "u")) + out(("u", "z")) >= 1000000L,
      "every union-source permutation min comes from one of its halves")
    assert(out(("a", "u")) > out(("a", "z")))
    assert(out(("u", "z")) > out(("a", "z")))
  }

  test("deterministic under repartitioning; full upper-triangular output") {
    val docs = graft.sources.Tables.documents(spark, Sf001)
    val a = Dedup.sourceSimilarity(docs, "text", "source").collect()
    val b = Dedup.sourceSimilarity(docs.repartition(13), "text", "source")
      .collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 190, "20 sources -> C(20,2) = 190 pairs")
  }
}
