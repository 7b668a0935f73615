package graft

import org.apache.spark.sql.functions._
import graft.ops.Chunking

class ChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunkFixed windows cover the text with the declared overlap") {
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val chunks = Chunking.chunkFixed(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id",
        size = 100, overlap = 20)
      .orderBy("start").select("start", "chunk").as[(Long, String)].collect()
    assert(chunks.map(_._1) === Array(1L, 81L, 161L))
    assert(chunks(0)._2 === text.substring(0, 100))
    // consecutive chunks share exactly `overlap` characters
    assert(chunks(0)._2.takeRight(20) === chunks(1)._2.take(20))
    // every char of the source appears in some chunk
    assert(chunks.map { case (s, c) => (s, s + c.length - 1) }
      .foldLeft(0L) { case (cov, (s, e)) => assert(s <= cov + 1); math.max(cov, e) } === 260L)
  }

  test("chunkFixed emits a single chunk for short and empty texts") {
    val got = Chunking.chunkFixed(
        Seq((1L, "short"), (2L, "")).toDF("doc_id", "text"), "text", "doc_id",
        size = 100, overlap = 20)
      .select("doc_id", "start", "chunk").as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 1L, "short"), (2L, 1L, "")))
  }

  test("redactPii removes emails and long numbers, keeps short numbers") {
    val redacted = Seq("mail bob.smith@corp.example.com card 12345678 pin 123")
      .toDF("t").select(Chunking.redactPii(col("t"))).as[String].head()
    assert(redacted === "mail <EMAIL> card <NUM> pin 123")
  }

  test("monotoneIdBuckets: bucket count is fixed regardless of row count") {
    // the scale contract of packByBudgetGlobal: its only unpartitioned
    // window runs over one row per bucket, so the bucket count must NOT
    // grow with the data — 10× the rows, same ≤ target buckets
    val target = 8
    Seq(100, 1000, 10000).foreach { n =>
      val df = (0L until n.toLong).toDF("doc_id")
      val nBuckets = df
        .select(Chunking.monotoneIdBuckets(df, "doc_id", target).as("bk"))
        .distinct().count()
      assert(nBuckets <= target, s"n=$n produced $nBuckets buckets (> $target)")
      assert(nBuckets == target,
        s"n=$n: ids are dense from 0 so all $target buckets should be hit, got $nBuckets")
    }
    // and the bucketing stays monotone in the id order (the decomposition
    // precondition): bucket of id a ≤ bucket of id b whenever a ≤ b
    val df = (0L until 500L).toDF("doc_id")
    val bk = df.select(col("doc_id"),
        Chunking.monotoneIdBuckets(df, "doc_id", 7).as("bk"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(bk.sliding(2).forall { case Array((_, b1), (_, b2)) => b1 <= b2 })
  }

  test("packByBudgetGlobal with monotoneIdBuckets == one global window") {
    // pack ids from the decomposed two-phase form must equal the
    // non-scalable single-window formulation exactly
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map(i => (i, 1L + rnd.nextInt(40).toLong))
    val df = rows.toDF("doc_id", "n_tok").repartition(5)
    val got = Chunking.packByBudgetGlobal(df,
        Chunking.monotoneIdBuckets(df, "doc_id", 8),
        Seq("doc_id"), "n_tok", budget = 100L)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    var cum = 0L
    val want = rows.sortBy(_._1).map { case (id, t) =>
      val p = cum / 100L; cum += t; id -> p
    }.toMap
    assert(got === want)
  }

  test("splitAssign is content-stable and respects the 80/10/10 shape") {
    val docs = (0 until 2000).map(i => s"document number $i with content").toDF("t")
    val counts = docs.select(Chunking.splitAssign(col("t")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    // content-hash buckets: expect rough 80/10/10 (±5pp at n=2000)
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    // same content -> same split, regardless of row order / repartitioning
    val a = docs.repartition(7).select(col("t"), Chunking.splitAssign(col("t")).as("s"))
      .as[(String, String)].collect().toMap
    val b = docs.repartition(3).select(col("t"), Chunking.splitAssign(col("t")).as("s"))
      .as[(String, String)].collect().toMap
    assert(a === b)
  }
}
