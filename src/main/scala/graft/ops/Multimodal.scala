package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed in partition-sized batches.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[FakeDecoder]] derives deterministic pseudo-features
  * from the bytes. Everything around it — the schema, the batched
  * `mapPartitions` shape (the Scala analog of `mapInPandas`: one
  * iterator per partition, amortized per-batch setup), partitioning —
  * is real and is exactly what swaps in a JNI/FFmpeg decoder in
  * production.
  */
object Multimodal {

  /** One media row: payload + envelope metadata. */
  final case class MediaRecord(
      media_id: Long, mime: String, payload: Array[Byte], n_bytes: Long)

  /** Decoded features (width/height/histogram here; logits/frames in a
    * real pipeline).
    */
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, mean_intensity: Double, byte_entropy: Double)

  /** Deterministic stand-in for a real codec: "dimensions" and
    * "intensity" derived from byte statistics. Swap this object out for
    * the production decoder; nothing else changes.
    */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.payload
      val hist = new Array[Long](256)
      var sum = 0L
      var i = 0
      while (i < bytes.length) { val b = bytes(i) & 0xff; hist(b) += 1; sum += b; i += 1 }
      val n = math.max(bytes.length, 1)
      var entropy = 0.0
      var j = 0
      while (j < 256) {
        if (hist(j) > 0) { val p = hist(j).toDouble / n; entropy -= p * math.log(p) / math.log(2) }
        j += 1
      }
      // fake dimensions: a square-ish frame inferred from payload size
      val side = math.max(1, math.sqrt(n.toDouble).toInt)
      MediaFeatures(r.media_id, r.mime, r.n_bytes, side, side,
        sum.toDouble / n, entropy)
    }
  }

  /** Build a media table from the documents corpus (text bytes standing
    * in for encoded frames): the plumbing target the decode stage runs
    * over.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      length(col("text")).cast("long").as("n_bytes"))

  /** The batched decode pass. `mapPartitions` keeps per-partition setup
    * (codec init, model load) amortized over the whole partition —
    * the property `mapInPandas` gives Python pipelines.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder setup would go here
      it.map(FakeDecoder.decode)
    }
  }

  /** One sampled "frame": a fixed-width byte window at a deterministic
    * offset (evenly spaced over the payload, endpoints included).
    */
  final case class FrameSample(
      media_id: Long, frame_idx: Int, frame_off: Long, byte_sum: Long)

  /** Video frame sampling over binary payloads — the row-explode stage
    * of a video pipeline (1 media row → nFrames frame rows), with the
    * decode again stubbed as byte windows: a real pipeline swaps the
    * window read for a keyframe decode at the same offsets. Offsets are
    * pure integer arithmetic (`i·(len−frame)/(n−1)`, floor), so the
    * sampled set is reproducible across engines — q_frame_sample
    * oracle-checks the full explode + per-frame reduction in DuckDB.
    * Payloads shorter than one frame are skipped (the guard a real
    * sampler needs for truncated files).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int, nFrames: Int): Dataset[FrameSample] = {
    import spark.implicits._
    require(frameSize > 0 && nFrames > 1)
    media.as[MediaRecord].flatMap { r =>
      val len = r.payload.length
      if (len < frameSize) Iterator.empty
      else (0 until nFrames).iterator.map { i =>
        val off = i.toLong * (len - frameSize) / (nFrames - 1)
        var s = 0L
        var p = 0
        while (p < frameSize) { s += r.payload(off.toInt + p) & 0xff; p += 1 }
        FrameSample(r.media_id, i, off, s)
      }
    }
  }
}
