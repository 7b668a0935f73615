package graft

import graft.streaming.StreamBench

/** Live-rate streaming proof (r9): the canonical stateful pipeline —
  * rate source → watermarked session_window agg → keyed upsert sink —
  * must SUSTAIN a configured input rate with PLATEAUED state, measured
  * from real StreamingQueryProgress telemetry (E79), not synthetic
  * MemoryStream batches. The committed throughput record
  * (bench_baselines/r09_streaming.json) runs the same harness at
  * 25k/100k rows/s on 32 cores; this spec pins a modest rate on the
  * 4-core test session so the property is enforced every round.
  */
class StreamBenchSpec extends SparkSpecBase {

  test("rate->session_window->upsert sustains 2k rows/s with bounded state") {
    val dir = java.nio.file.Files.createTempDirectory("sbspec").toString
    // 40 s, not 18: on a slow-start host the first batches run 4-7 s
    // against the 2 s trigger (codegen + state-store init + parquet
    // upsert on 4 cores), and the warmup skip of 3 batches needs a
    // long enough tail of measured batches left to judge sustain.
    val rec = StreamBench.run(spark, rowsPerSecond = 2000, runSeconds = 40,
      stateDir = dir)
    info(StreamBench.json(rec))
    // throughput: the post-warmup window ingests >= 90% of the nominal
    // rate and the final batch is near nominal size (no backlog).
    assert(rec.sustained,
      s"not sustained: in=${rec.inRowsPerSec}/s of ${rec.rate}, " +
        s"last batch ${rec.lastBatchInput} vs nominal ${rec.nominalBatchInput}")
    // state: session store plateaus (watermark eviction keeps pace with
    // session creation) — last-third mean within 1.5x of the mid-third.
    assert(rec.stateBounded, s"state grew: ratio ${rec.stateGrowth}")
    assert(rec.stateLastRows > 0, "state telemetry empty — nothing measured")
    // the serving table is bounded by user cardinality, never runtime
    assert(rec.sinkRows > 0 && rec.sinkRows <= 4L * rec.rate,
      s"sink rows ${rec.sinkRows} outside (0, 4*rate]")
  }
}
