package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Source-side rate limiting — the ingestion backpressure control. A
  * 100 TB backfill pointed at a streaming pipeline must NOT arrive as
  * one giant micro-batch (state blowup, executor OOM, checkpoint
  * stalls); `maxFilesPerTrigger` caps each batch at a bounded slice of
  * the backlog while the query drains the whole backlog eventually.
  * This spec proves both halves: bounded per-batch input AND complete
  * drainage.
  */
class BackpressureSpec extends SparkSpecBase {
  import spark.implicits._

  test("maxFilesPerTrigger bounds every micro-batch; the backlog still drains fully") {
    val srcDir = Files.createTempDirectory("graft-bp-src").toString
    // a 12-file backlog, 50 rows each
    (0 until 12).foreach { i =>
      spark.range(i * 50L, i * 50L + 50L).select(col("id"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val nFiles = 12

    val batchRows = mutable.ArrayBuffer.empty[Long]
    val seen = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema("id LONG")
      .option("maxFilesPerTrigger", "3")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select(col("id")).as[Long](implicitly).collect()
        batchRows.synchronized { batchRows += ids.length.toLong; seen ++= ids }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(seen.sorted === (0L until nFiles * 50L).toVector,
      "every backlog row must arrive exactly once")
    assert(batchRows.length >= nFiles / 3,
      s"rate limit must split the backlog into multiple batches, got $batchRows")
    assert(batchRows.forall(_ <= 3L * 50L),
      s"no micro-batch may exceed maxFilesPerTrigger × rows/file: $batchRows")
  }
}
