package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ---------------------------------------------------------------------
  // REAL header decode (r7): the one formerly-stubbed step. The payloads
  // below carry genuine PNG / JPEG / WAV container structure, and
  // [[HeaderDecoder]] parses dimensions / sample counts from the BYTES —
  // magic-sniffed, not mime-trusted. Only the pixel/sample decode (which
  // needs codecs absent from this environment) stays out of scope; the
  // container parse, the part a data pipeline actually runs to audit and
  // route media, is real and oracle-checked (q_media_dims).
  // ---------------------------------------------------------------------

  /** Parsed container metadata; image fields are 0 for audio and vice
    * versa, `fmt` = "png" | "jpeg" | "wav" | "unknown".
    */
  final case class MediaDims(
      media_id: Long, fmt: String, width: Int, height: Int,
      channels: Int, sample_rate: Int, n_samples: Long, n_bytes: Long)

  /** Deterministic sample-media synthesizer: real container headers
    * around the document text as body bytes. Dimensions/rates are pure
    * integer arithmetic in `media_id`, so an oracle can derive the
    * EXPECTED parse result independently — if [[HeaderDecoder]]
    * misparses any field, the oracle catches it.
    *   - id % 3 == 0 → PNG  (w = 16 + id%317, h = 16 + (id·7)%211)
    *   - id % 3 == 1 → WAV  (PCM16, ch = 1 + id%2, rate = 8000·(1 + (id/3)%3),
    *                         data = body floored to a block multiple)
    *   - id % 3 == 2 → JPEG (w = 16 + id%251, h = 16 + (id·5)%173)
    */
  def mediaWithHeaders(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("body"))
      .as[(Long, Array[Byte])]
      .map { case (id, body) =>
        val payload = (id % 3) match {
          case 0 => MediaCodecs.png(16 + (id % 317).toInt, 16 + ((id * 7) % 211).toInt, body)
          case 1 => MediaCodecs.wav(1 + (id % 2).toInt, 8000 * (1 + (id / 3 % 3)).toInt, body)
          case _ => MediaCodecs.jpeg(16 + (id % 251).toInt, 16 + ((id * 5) % 173).toInt, body)
        }
        (id, payload, payload.length.toLong)
      }
      .toDF("media_id", "payload", "n_bytes")
  }

  /** Container writers — minimal but SPEC-CORRECT structure (PNG chunk
    * CRCs included, JPEG marker segments length-prefixed, RIFF chunks
    * word-aligned), so the parser opposite can't cheat on offsets.
    */
  object MediaCodecs {
    private def be32(v: Int): Array[Byte] =
      Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
        ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
        ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

    private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }

    /** PNG: signature + IHDR(w, h, 8-bit RGB) + one IDAT carrying the
      * body verbatim (not zlib — the parse target is the container) + IEND.
      */
    def png(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
      sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", body) ++
        pngChunk("IEND", Array.emptyByteArray)
    }

    /** Baseline JPEG: SOI, APP0/JFIF, SOF0 with (h, w), SOS, body, EOI. */
    def jpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
      val soi = Array(0xff, 0xd8).map(_.toByte)
      val app0 = Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++
        "JFIF".getBytes("US-ASCII") ++
        Array(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00).map(_.toByte)
      // SOF0: len 17, precision 8, height, width, 3 components
      val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte) ++
        Array(((h >>> 8) & 0xff).toByte, (h & 0xff).toByte,
          ((w >>> 8) & 0xff).toByte, (w & 0xff).toByte) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
      val sos = Array(0xff, 0xda, 0x00, 0x0c, 0x03, 0x01, 0x00, 0x02,
        0x11, 0x03, 0x11, 0x00, 0x3f, 0x00).map(_.toByte)
      val eoi = Array(0xff, 0xd9).map(_.toByte)
      soi ++ app0 ++ sof0 ++ sos ++ body ++ eoi
    }

    /** WAV: RIFF/WAVE with a canonical PCM16 fmt chunk and a data chunk
      * holding the body floored to a whole number of sample blocks.
      */
    def wav(channels: Int, sampleRate: Int, body: Array[Byte]): Array[Byte] = {
      val blockAlign = 2 * channels
      val dataLen = body.length - body.length % blockAlign
      val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
        le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(16)
      val riffLen = 4 + (8 + fmt.length) + (8 + dataLen)
      "RIFF".getBytes("US-ASCII") ++ le32(riffLen) ++ "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
        "data".getBytes("US-ASCII") ++ le32(dataLen) ++ body.take(dataLen)
    }
  }

  /** The real container parsers: magic-sniffed format detection, then a
    * structural walk — PNG chunk list to IHDR, JPEG marker segments to
    * the first SOF, RIFF chunk list to fmt/data. Truncated or foreign
    * payloads come back `fmt = "unknown"` with zeros (the quarantine
    * row, not an exception — one bad file must not kill a 100 TB scan).
    */
  object HeaderDecoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32i(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32i(b: Array[Byte], i: Int): Long =
      (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3).toLong << 24)) & 0xffffffffL

    def decode(id: Long, p: Array[Byte]): MediaDims = {
      val n = p.length.toLong
      if (p.length >= 8 && u8(p, 0) == 0x89 && u8(p, 1) == 'P' && u8(p, 2) == 'N' &&
          u8(p, 3) == 'G' && u8(p, 4) == 0x0d && u8(p, 5) == 0x0a &&
          u8(p, 6) == 0x1a && u8(p, 7) == 0x0a) parsePng(id, p, n)
      else if (p.length >= 2 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8) parseJpeg(id, p, n)
      else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
          p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
        parseWav(id, p, n)
      else MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
    }

    private def parsePng(id: Long, p: Array[Byte], n: Long): MediaDims = {
      // chunk walk: [len][type][data][crc]; IHDR must come first but a
      // defensive parser walks until it finds it
      // all chunk arithmetic in Long: a corrupt 4-byte length near
      // Int.MaxValue would wrap `i + 12 + len` negative in Int, slip the
      // bounds guard, and index out of bounds — untrusted bytes must come
      // back `unknown`, never throw (mirrors parseWav)
      var i = 8
      while (i + 8 <= p.length) {
        val len = be32i(p, i).toLong
        val end = i.toLong + 12L + len
        val isIhdr = p(i + 4) == 'I' && p(i + 5) == 'H' && p(i + 6) == 'D' && p(i + 7) == 'R'
        if (isIhdr && len >= 8 && i.toLong + 8L + len <= p.length)
          return MediaDims(id, "png", be32i(p, i + 8), be32i(p, i + 12), 0, 0, 0L, n)
        if (len < 0 || end > p.length)
          return MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
        i = end.toInt
      }
      MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
    }

    private def parseJpeg(id: Long, p: Array[Byte], n: Long): MediaDims = {
      // marker segment walk to the first frame header (SOF0-15 minus
      // DHT/JPG/DAC); stop at SOS — past it is entropy-coded data
      var i = 2
      while (i + 4 <= p.length && u8(p, i) == 0xff) {
        val m = u8(p, i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
        else {
          val len = be16(p, i + 2)
          if (len < 2 || i + 2 + len > p.length) return MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof && len >= 7)
            return MediaDims(id, "jpeg", be16(p, i + 7), be16(p, i + 5), 0, 0, 0L, n)
          if (m == 0xda) return MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
          i += 2 + len
        }
      }
      MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
    }

    private def parseWav(id: Long, p: Array[Byte], n: Long): MediaDims = {
      var channels = 0
      var rate = 0
      var blockAlign = 0
      var dataLen = -1L
      var i = 12
      // RIFF chunk walk, word-aligned; unknown chunks skipped
      while (i + 8 <= p.length) {
        val len = le32i(p, i + 4)
        val end = i + 8 + len
        if (p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' && p(i + 3) == ' ' &&
            len >= 16 && end <= p.length) {
          channels = le16(p, i + 10)
          rate = le32i(p, i + 12).toInt
          blockAlign = le16(p, i + 20)
        } else if (p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' && p(i + 3) == 'a' &&
            end <= p.length) {
          dataLen = len
        }
        if (len < 0 || end > p.length) {
          return MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
        }
        i = (end + (len % 2)).toInt // odd chunks pad one byte
      }
      if (channels > 0 && blockAlign > 0 && dataLen >= 0)
        MediaDims(id, "wav", 0, 0, channels, rate, dataLen / blockAlign, n)
      else MediaDims(id, "unknown", 0, 0, 0, 0, 0L, n)
    }
  }

  /** Batched container parse over the media table — the same
    * `mapPartitions` shape as [[extractFeatures]], with the REAL parser.
    */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaDims] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup (codec tables) would go here
        it.map { case (id, p) => HeaderDecoder.decode(id, p) }
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

  /** Exact media dedup by payload digest — the binary-column analog of
    * [[graft.ops.Dedup]]'s by-fingerprint text dedup: md5 the raw
    * payload BYTES in the scan, shuffle only (digest, id, mime,
    * n_bytes) — 16-byte keys instead of megabyte payloads — and keep
    * the smallest id per digest. A 100 TB media lake dedups exactly
    * this way (the digest is computed where the bytes already are; no
    * payload ever crosses the network), and the same digest column is
    * what object stores and crawl pipelines carry as the content
    * address.
    *
    * Dedup is by CONTENT, deliberately across mime labels: the same
    * bytes served as image/png and video/mp4 are still one payload, so
    * `n_mimes` > 1 flags mislabeled copies — a real crawl pathology.
    *
    * Returns one row per duplicated digest (n_copies ≥ 2):
    * (digest, keep_id, n_copies, n_mimes, n_bytes).
    */
  def dedupMediaExact(media: DataFrame): DataFrame =
    media
      .select(md5(col("payload")).as("digest"), col("media_id"),
        col("mime"), col("n_bytes"))
      .groupBy(col("digest"))
      .agg(
        min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        count_distinct(col("mime")).as("n_mimes"),
        // identical bytes ⇒ identical length; min is just the portable pick
        min(col("n_bytes")).as("n_bytes"))
      .filter(col("n_copies") >= 2)

  /** Content-address summary of a media table: per mime plus an 'ALL'
    * row — the dedup-planning numbers a media lake reads before
    * running [[dedupMediaExact]] (how much volume is duplicate bytes,
    * per corpus slice). `bytes_dedup` counts each distinct digest's
    * payload once; the ALL row dedups ACROSS mimes, so the per-mime
    * `n_distinct` values can sum to more than ALL's when the same
    * bytes circulate under different labels. Same scan shape as the
    * dedup itself: digests in the scan, digest-keyed shuffles only.
    */
  def mediaDedupStats(media: DataFrame): DataFrame = {
    val d = media.select(md5(col("payload")).as("digest"), col("mime"),
      col("n_bytes"))
    // two-level aggregation, no join: per-(group, digest) partials fold
    // into the group stats — n_media = Σ copies, n_distinct = row
    // count, bytes_dedup = Σ min-bytes. One digest-keyed shuffle per
    // grouping, both partial-aggregable.
    def statsBy(key: Column): DataFrame =
      d.groupBy(key.as("mime_group"), col("digest"))
        .agg(count(lit(1)).as("copies"), sum(col("n_bytes")).as("bytes_g"),
          min(col("n_bytes")).as("b"))
        .groupBy(col("mime_group"))
        .agg(sum(col("copies")).as("n_media"),
          count(lit(1)).as("n_distinct"),
          sum(col("bytes_g")).as("bytes_total"),
          sum(col("b")).as("bytes_dedup"))
    statsBy(col("mime")).unionByName(statsBy(lit("ALL")))
      .select(col("mime_group"), col("n_media"), col("n_distinct"),
        (col("n_media") - col("n_distinct")).as("n_dup_copies"),
        col("bytes_total"), col("bytes_dedup"))
  }
}
