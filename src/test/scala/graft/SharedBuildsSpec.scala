package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, PairFunnel, Similarity}

/** r16 optimization-round sharing: the span pass, the contamination
  * scan, and the ANN fit memo are SESSION-SHARED builds now — these
  * tests pin (1) build-once (witnessed by the build counters / object
  * identity), and (2) result identity with the direct per-query form
  * they replaced, so the sharing can never drift from the unshared
  * semantics the oracles check.
  */
class SharedBuildsSpec extends SparkSpecBase {

  private def docs = {
    val s = spark; import s.implicits._
    val block = "the quick brown fox jumps over the lazy dog again and again " * 3
    (0 until 40).map { i =>
      (i.toLong, s"doc $i unique tail ${"x" * i} $block")
    }.toDF("doc_id", "text")
  }

  test("sharedSpans: build-once per (plan, tag, params), identical to the direct op") {
    PairFunnel.invalidateAll()
    val d = docs
    val b0 = PairFunnel.buildsExecuted
    val a = PairFunnel.sharedSpans(d, "text", "doc_id", "spans-spec", minLen = 40)
    assert(PairFunnel.buildsExecuted === b0 + 1)
    val b = PairFunnel.sharedSpans(d, "text", "doc_id", "spans-spec", minLen = 40)
    assert(PairFunnel.buildsExecuted === b0 + 1) // second call: cache hit
    assert(a eq b)
    val direct = Dedup.sharedSubstringSpans(d, "text", "doc_id", minLen = 40)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(a.collect().map(key).toSet === direct.collect().map(key).toSet)
    // a different minLen is a different entry, not a stale hit
    val c = PairFunnel.sharedSpans(d, "text", "doc_id", "spans-spec", minLen = 80)
    assert(PairFunnel.buildsExecuted === b0 + 2)
    assert(!(c eq a))
  }

  test("contaminationPairs: build-once, identical to the direct fused scan") {
    PairFunnel.invalidateAll()
    val d = docs
    val evalDocs = d.filter(col("doc_id") % 20 === 3)
    val corpus = d.filter(col("doc_id") % 20 =!= 3)
    val b0 = PairFunnel.buildsExecuted
    val a = PairFunnel.contaminationPairs(d, corpus, evalDocs,
      "text", "doc_id", "contam-spec", shingleN = 8, threshold = 0.8)
    assert(PairFunnel.buildsExecuted === b0 + 1)
    val b = PairFunnel.contaminationPairs(d, corpus, evalDocs,
      "text", "doc_id", "contam-spec", shingleN = 8, threshold = 0.8)
    assert(PairFunnel.buildsExecuted === b0 + 1)
    assert(a eq b)
    val direct = Dedup.contaminationPairsFused(corpus, evalDocs,
      "text", "doc_id", shingleN = 8, threshold = 0.8)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9))
    assert(a.collect().map(key).toSet === direct.collect().map(key).toSet)
    // a different SPLIT under the same tag must miss (key folds both
    // side plans), not silently serve the other split's pairs
    val eval2 = d.filter(col("doc_id") % 20 === 4)
    val corpus2 = d.filter(col("doc_id") % 20 =!= 4)
    PairFunnel.contaminationPairs(d, corpus2, eval2,
      "text", "doc_id", "contam-spec", shingleN = 8, threshold = 0.8)
    assert(PairFunnel.buildsExecuted === b0 + 2)
  }

  test("ANN fit memo: qrels and quantizer fits build once, results unchanged") {
    Similarity.invalidateMemo()
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val e = (0 until 300).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    val f0 = Similarity.fitBuildsExecuted
    val qa = Similarity.bruteForceTopKShared(e, "vec_id", "embedding",
      q, "qid", "qv", k = 3)
    assert(Similarity.fitBuildsExecuted === f0 + 1)
    val qb = Similarity.bruteForceTopKShared(e, "vec_id", "embedding",
      q, "qid", "qv", k = 3)
    assert(Similarity.fitBuildsExecuted === f0 + 1)
    assert(qa eq qb)
    // identical rows to the lazy core
    val direct = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      q, "qid", "qv", k = 3)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getLong(2))
    assert(qa.select("query_id", "rank", "neighbor_id").collect().map(key).toSet
      === direct.select("query_id", "rank", "neighbor_id").collect().map(key).toSet)

    // IVF fit memo: same params -> one fit; results identical run-to-run
    val f1 = Similarity.fitBuildsExecuted
    val r1 = Similarity.ivfTopK(e, "vec_id", "embedding", q, "qid", "qv",
      k = 3, numCells = 4, nProbe = 2, fitFraction = 1.0).collect()
    val afterFirst = Similarity.fitBuildsExecuted
    assert(afterFirst > f1) // the fit ran
    val r2 = Similarity.ivfTopK(e, "vec_id", "embedding", q, "qid", "qv",
      k = 3, numCells = 4, nProbe = 2, fitFraction = 1.0).collect()
    assert(Similarity.fitBuildsExecuted === afterFirst) // served from memo
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)

    // different numCells is a different fit, not a stale hit
    Similarity.ivfTopK(e, "vec_id", "embedding", q, "qid", "qv",
      k = 3, numCells = 8, nProbe = 2, fitFraction = 1.0).collect()
    assert(Similarity.fitBuildsExecuted > afterFirst)
  }
}
