package graft

import org.apache.spark.sql.functions._
import graft.ops.{BucketRefine, Dedup, PairFunnel}

/** r12 heavy-bucket sub-refinement (BucketRefine) + session-standing
  * pair funnel (PairFunnel).
  *
  * The refinement claims BIT-IDENTITY: for any corpus, the candidate
  * set (hence the verified pair set) with refinement on equals the flat
  * banding join's. The pigeonhole argument is in BucketRefine's
  * scaladoc; these tests pin it empirically on a corpus engineered to
  * have buckets far above the cap, including the pathological shape the
  * r11 k=1000 probe flagged (many mutually-DISSIMILAR docs colliding in
  * one bucket through a shared boilerplate block).
  */
class BucketRefineSpec extends SparkSpecBase {
  import spark.implicits._

  test("lossless() math: 2-byte blocks cover any cut above 1/2") {
    assert(BucketRefine.lossless(64, 0.55))
    assert(BucketRefine.lossless(64, 0.51))
    assert(!BucketRefine.lossless(64, 0.50)) // 32 agreeing bytes can dodge every block
    assert(BucketRefine.lossless(16, 0.51))
    assert(!BucketRefine.lossless(16, 0.4))
  }

  // boilerplate prefix long enough that several shingle-bands hash on it
  // alone (all docs collide in those bands), plus a unique tail per doc
  // (mutual jaccard far below threshold) — the heavy-bucket pathology.
  // A handful of planted true near-dup pairs must survive identically.
  private def heavyCorpus = {
    val boiler = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua ") * 3
    val rnd = new scala.util.Random(7)
    val uniques = (0 until 400).map { i =>
      val tail = Seq.fill(30)(rnd.alphanumeric.take(8).mkString).mkString(" ")
      (i.toLong, s"$boiler $tail")
    }
    // planted: 1000/1001 exact copies, 1002/1003 one-word edit
    val tailA = Seq.fill(30)(rnd.alphanumeric.take(8).mkString).mkString(" ")
    val planted = Seq(
      (1000L, s"$boiler $tailA"),
      (1001L, s"$boiler $tailA"),
      (1002L, s"$boiler $tailA extra"),
      (1003L, s"$boiler $tailA bonus"))
    (uniques ++ planted).toDF("doc_id", "text")
  }

  test("refined banding join is bit-identical to the flat join on a heavy-bucket corpus") {
    val docs = heavyCorpus
    def pairs(cap: Int) = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        Dedup.MinhashParams(heavyBucketCap = cap))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val flat = pairs(0)          // cap ≤ 0 disables refinement: the r11 plan
    val refined = pairs(8)       // every 404-doc bucket far above the cap
    assert(refined === flat)
    assert(flat.exists(p => p._1 == 1000L && p._2 == 1001L),
      "planted exact copy must survive both plans")
  }

  test("refinement leaves corpora without heavy buckets on the identical plan output") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog in the forest"),
      (1L, "the quick brown fox jumps over the lazy dog in the woods"),
      (2L, "completely unrelated text about distributed query planning")
    ).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        Dedup.MinhashParams(jaccardThreshold = 0.7, heavyBucketCap = cap))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs(512) === pairs(0))
  }

  test("PairFunnel caches per (session, tag, params) and matches the direct build") {
    PairFunnel.invalidateAll()
    val docs = heavyCorpus
    val a = PairFunnel.nearDupPairs(docs, "text", "doc_id", "spec-corpus")
    val b = PairFunnel.nearDupPairs(docs, "text", "doc_id", "spec-corpus")
    assert(a eq b, "second call must return the cached frame")
    val direct = Dedup.minhashNearDupPairs(docs, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val shared = a.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(shared === direct)
    // labels consume the cached pairs and agree with the direct closure
    val l1 = PairFunnel.componentLabels(docs, "text", "doc_id", "spec-corpus")
    val l2 = PairFunnel.componentLabels(docs, "text", "doc_id", "spec-corpus")
    assert(l1 eq l2)
    val directLabels = Dedup.componentMinLabels(
      Dedup.minhashNearDupPairs(docs, "text", "doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(l1.as[(Long, Long)].collect().toSet === directLabels)
    // different tag or params = different entry
    val c = PairFunnel.nearDupPairs(docs, "text", "doc_id", "other-corpus")
    assert(!(c eq a))
    PairFunnel.invalidateAll()
  }

  test("PairFunnel labels-first call nests the pairs build without recursion") {
    // the labels build invokes the pairs build for a DIFFERENT cache
    // key; with ConcurrentHashMap.compute that threw "Recursive update"
    // whenever the two keys shared a bin (a per-session lottery — the
    // key embeds the session identity hash). Calling componentLabels on
    // a FRESH tag exercises exactly the nested-build path.
    PairFunnel.invalidateAll()
    val docs = heavyCorpus
    val l = PairFunnel.componentLabels(docs, "text", "doc_id", "labels-first-corpus")
    assert(l.count() > 0)
    // and the pairs entry it built inside is served on the next call
    val p = PairFunnel.nearDupPairs(docs, "text", "doc_id", "labels-first-corpus")
    val p2 = PairFunnel.nearDupPairs(docs, "text", "doc_id", "labels-first-corpus")
    assert(p eq p2)
    PairFunnel.invalidateAll()
  }
}
