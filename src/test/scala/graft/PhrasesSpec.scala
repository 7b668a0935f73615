package graft

import org.apache.spark.sql.functions._
import graft.ops.Phrases

class PhrasesSpec extends SparkSpecBase {
  import spark.implicits._

  test("collocations: a true phrase flags, an incidental pair does not") {
    // "new york" always co-occurs (c_ab = c_a = c_b = 10); filler words
    // pair incidentally. N = 60 tokens, lift(new,york) =
    // (10-5)*60/(10*10) = 3 > 1 → phrase; the filler chain "a b"
    // occurs every doc too but with the same counts — so construct the
    // negative from a pair whose members are frequent but whose
    // co-occurrence is at the discount edge.
    val phrase = Seq.fill(10)("new york a b")
    val frequent = Seq.fill(10)("a b a b")
    val docs = (phrase ++ frequent).toDF("text")
    val out = Phrases.collocations(docs, "text", discount = 5, tau = 1)
      .select("w1", "w2", "pair_count", "lift_micro", "is_phrase")
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ny = out(("new", "york"))
    assert(ny._3 === 10L)
    // N = 10*4 + 10*4 = 80 tokens; lift = (10-5)*80/(10*10) = 4.0
    assert(ny._4 === 4000000L)
    assert(ny._5, "a deterministic collocation must flag as a phrase")
    // "a b": c_ab = 10 + 20 = 30, c_a = 30, c_b = 30 →
    // lift = 25*80/900 ≈ 2.22 — still associated in this tiny corpus
    assert(out(("a", "b"))._4 === math.round(25.0 * 80 * 1e6 / 900))
    // "b a" occurs only inside the frequent block (10 docs × 1) +
    // nothing in the phrase block... = 10; lift = 5*80/900 < 1 → NOT a
    // phrase: the discount+threshold rejects weak association
    assert(out(("b", "a"))._3 === 10L)
    assert(!out(("b", "a"))._5)
  }

  test("collocations: pairs at or below the discount are dropped; single-word docs contribute nothing") {
    val docs = (Seq.fill(5)("x y") ++ Seq.fill(8)("solo")).toDF("text")
    val out = Phrases.collocations(docs, "text").collect()
    assert(out.isEmpty, "pair_count must exceed the discount strictly")
  }

  test("collocations: deterministic under repartitioning (real corpus)") {
    val docs = graft.sources.Tables.documents(spark, Sf001)
    val a = Phrases.collocations(docs, "text").collect()
    val b = Phrases.collocations(docs.repartition(13), "text").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 30)
  }
}
