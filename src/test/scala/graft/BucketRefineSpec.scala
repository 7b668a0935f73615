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

  // --- r15: pin the width-3 anchor machinery (r14 verdict item 3) ---
  // q_simjoin_prefix's 1e-5 runtime guard (SparkEntry, `require(
  // anchorLoss <= 1e-5)`) is only as meaningful as anchorLoss's math;
  // these cases pin the closed form against hand-computed values, its
  // monotonicity, and subkeysWide's actual key enumeration so a
  // refactor cannot silently change what the guard guards.

  test("anchorLoss matches hand-computed (1 - tau^w)^floor(n/w)") {
    // 64-byte digest, width 3 => 21 blocks; tau = 0.8 => (1-0.512)^21
    assert(math.abs(BucketRefine.anchorLoss(64, 3, 0.8) - 2.8630e-7)
      / 2.8630e-7 < 1e-3)
    // tau = 0.9 => (1-0.729)^21
    assert(math.abs(BucketRefine.anchorLoss(64, 3, 0.9) - 1.2370e-12)
      / 1.2370e-12 < 1e-3)
    // width 2 => 32 blocks; tau = 0.8 => (1-0.64)^32
    assert(math.abs(BucketRefine.anchorLoss(64, 2, 0.8) - 6.3340e-15)
      / 6.3340e-15 < 1e-3)
    // floor semantics: a 65th byte adds no width-2 block (the remainder
    // is uncovered by subkeysWide — by design; see its scaladoc)
    assert(BucketRefine.anchorLoss(65, 2, 0.8) ===
      BucketRefine.anchorLoss(64, 2, 0.8))
    // the q_simjoin_prefix guard's actual operating point stays under it
    assert(BucketRefine.anchorLoss(64, 3, 0.8) <= 1e-5)
  }

  test("anchorLoss is monotone decreasing in tau and increasing in width") {
    val taus = Seq(0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
    taus.sliding(2).foreach { case Seq(lo, hi) =>
      assert(BucketRefine.anchorLoss(64, 3, lo) > BucketRefine.anchorLoss(64, 3, hi))
    }
    // wider blocks = weaker anchor (fewer, harder-to-agree blocks)
    assert(BucketRefine.anchorLoss(64, 2, 0.8) < BucketRefine.anchorLoss(64, 3, 0.8))
    assert(BucketRefine.anchorLoss(64, 3, 0.8) < BucketRefine.anchorLoss(64, 4, 0.8))
  }

  test("subkeysWide enumerates floor(n/w) block keys gated by the heavy flag") {
    // a 64-byte digest with distinguishable bytes
    val bytes = Array.tabulate(64)(i => (i * 7 + 3).toByte)
    val df = Seq((1, bytes, true), (2, bytes, false))
      .toDF("id", "dg", "heavy")
    val out = df.select(col("id"),
        BucketRefine.subkeysWide(col("dg"), 64, 3, col("heavy")).as("sks"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(out(1).size === 21, "64 bytes / width 3 = 21 blocks, remainder dropped")
    assert(out(1).distinct.size === 21, "distinct bytes => distinct block keys")
    assert(out(2) === Seq(-1L), "light rows keep the sentinel sub-key alone")
    // block i is a function of bytes [3i, 3i+3) ONLY: flipping a byte in
    // block 5 changes exactly that key; flipping the dropped 64th byte
    // (index 63) changes nothing (21*3 = 63 bytes covered)
    val b2 = bytes.clone(); b2(15) = (b2(15) ^ 0x5a).toByte // block 5
    val b3 = bytes.clone(); b3(63) = (b3(63) ^ 0x5a).toByte // remainder
    val out2 = Seq((1, b2, true), (2, b3, true)).toDF("id", "dg", "heavy")
      .select(col("id"),
        BucketRefine.subkeysWide(col("dg"), 64, 3, col("heavy")).as("sks"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(out2(1).zip(out(1)).zipWithIndex.count { case ((a, b), _) => a != b } === 1)
    assert(out2(1)(5) !== out(1)(5))
    assert(out2(2) === out(1), "the uncovered remainder byte never keys a block")
  }

  test("subkeys covers every byte for odd digest lengths (lossless coverage)") {
    // 5-byte digest => ceil(5/2) = 3 blocks, the last a single byte.
    // lossless(5, cut) asserts the pigeonhole over FULL coverage; the
    // r14 advisory caught subkeys delegating to the floor-block form,
    // which dropped byte 5 and could lose pairs the bound claims kept.
    val bytes = Array[Byte](10, 20, 30, 40, 50)
    val tail = bytes.clone(); tail(4) = 99
    val out = Seq((1, bytes, true), (2, tail, true)).toDF("id", "dg", "heavy")
      .select(col("id"), BucketRefine.subkeys(col("dg"), 5, col("heavy")).as("sks"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(out(1).size === 3, "ceil(5/2) = 3 blocks")
    assert(out(1).take(2) === out(2).take(2))
    assert(out(1)(2) !== out(2)(2), "the odd trailing byte must key its own block")
  }
}
