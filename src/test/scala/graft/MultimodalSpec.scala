package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("mediaFromDocuments builds binary payloads with typed metadata") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.count() === docs.count())
    val mimes = media.select("mime").distinct().collect().map(_.getString(0)).toSet
    assert(mimes === Set("image/png", "audio/wav", "video/mp4"))
  }

  test("extractFeatures decodes deterministically in partition batches") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length === docs.count())
    rows.foreach { f =>
      assert(f.byte_entropy >= 0.0 && f.byte_entropy <= 8.0)
      assert(f.width >= 1 && f.width === f.height)
      assert(f.mean_intensity > 0.0)
    }
    // determinism: same input, same features
    val again = Multimodal.extractFeatures(spark, media).collect()
    assert(rows.sortBy(_.media_id).toSeq === again.sortBy(_.media_id).toSeq)
  }

  test("HeaderDecoder parses PNG/JPEG/WAV container structure from bytes") {
    import Multimodal.{HeaderDecoder, MediaCodecs}
    val body = ("some payload text " * 20).getBytes("UTF-8")

    val png = HeaderDecoder.decode(1L, MediaCodecs.png(640, 480, body))
    assert(png.fmt === "png" && png.width === 640 && png.height === 480)

    val jpg = HeaderDecoder.decode(2L, MediaCodecs.jpeg(1920, 1080, body))
    assert(jpg.fmt === "jpeg" && jpg.width === 1920 && jpg.height === 1080)

    val wav = HeaderDecoder.decode(3L, MediaCodecs.wav(2, 44100, body))
    assert(wav.fmt === "wav" && wav.channels === 2 && wav.sample_rate === 44100)
    assert(wav.n_samples === (body.length - body.length % 4) / 4)

    // PNG CRC must cover type+data (spec-correct writer): verify one
    val pngBytes = MediaCodecs.png(10, 20, Array[Byte](1, 2, 3))
    val crc = new java.util.zip.CRC32
    crc.update(pngBytes, 12, 4 + 13) // IHDR type + data
    val stored = java.nio.ByteBuffer.wrap(pngBytes, 12 + 17, 4).getInt
    assert(stored === crc.getValue.toInt)
  }

  test("HeaderDecoder quarantines truncated and foreign payloads as unknown") {
    import Multimodal.{HeaderDecoder, MediaCodecs}
    val body = "abcdefghij".getBytes("UTF-8")
    val png = MediaCodecs.png(64, 64, body)
    // cut mid-IHDR: magic matches but the chunk walk must bail cleanly
    assert(HeaderDecoder.decode(1L, png.take(12)).fmt === "unknown")
    val jpeg = MediaCodecs.jpeg(64, 64, body)
    assert(HeaderDecoder.decode(2L, jpeg.take(6)).fmt === "unknown")
    assert(HeaderDecoder.decode(3L, "not media at all".getBytes).fmt === "unknown")
    assert(HeaderDecoder.decode(4L, Array.emptyByteArray).fmt === "unknown")
    // RIFF with no fmt chunk
    val bad = "RIFF".getBytes ++ Array[Byte](8, 0, 0, 0) ++ "WAVE".getBytes
    assert(HeaderDecoder.decode(5L, bad).fmt === "unknown")
  }

  test("HeaderDecoder never throws on arbitrary byte garbage (1000-case fuzz)") {
    // the 100 TB posture: a landing zone WILL contain truncated,
    // bit-flipped, and mislabeled files; the parser's contract is
    // "unknown, never exception". Fuzz random bytes, random-length
    // prefixes of VALID containers (magic intact, structure cut at
    // every possible byte), and valid containers with corrupted length
    // fields.
    import Multimodal.{HeaderDecoder, MediaCodecs}
    val rnd = new scala.util.Random(41)
    val body = Array.fill(200)(rnd.nextInt(256).toByte)
    val wholes = Seq(
      MediaCodecs.png(123, 77, body),
      MediaCodecs.jpeg(640, 480, body),
      MediaCodecs.wav(2, 22050, body))
    var checked = 0
    // pure random garbage
    (0 until 400).foreach { i =>
      val g = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val d = HeaderDecoder.decode(i.toLong, g) // must not throw
      assert(d.n_bytes === g.length); checked += 1
    }
    // every truncation point of each valid container (magic survives,
    // structure doesn't)
    wholes.foreach { w =>
      (0 until w.length by 3).foreach { cut =>
        HeaderDecoder.decode(1L, w.take(cut)); checked += 1
      }
    }
    // corrupted length fields at random offsets
    (0 until 200).foreach { i =>
      val w = wholes(i % 3).clone()
      w(rnd.nextInt(math.min(w.length, 60))) = rnd.nextInt(256).toByte
      HeaderDecoder.decode(i.toLong, w); checked += 1
    }
    assert(checked > 700)
  }

  test("HeaderDecoder survives huge chunk-length fields (Int-overflow probe)") {
    // single-byte corruption can't reach near-Int.MaxValue lengths, so
    // target them directly: a PNG whose first chunk claims 0x7FFFFFFx /
    // 0xFFFFFFFF bytes must come back unknown, not wrap `i + 12 + len`
    // negative and throw ArrayIndexOutOfBoundsException
    import Multimodal.{HeaderDecoder, MediaCodecs}
    val body = "abcdefghij".getBytes("UTF-8")
    for (lenBytes <- Seq(
        Array[Byte](0x7f, -1, -1, -1),      // 0x7FFFFFFF
        Array[Byte](0x7f, -1, -1, -12),     // 0x7FFFFFF4 — wraps i+12+len to negative
        Array[Byte](-1, -1, -1, -1),        // 0xFFFFFFFF → len < 0
        Array[Byte](0x7f, 0x7f, 0x7f, 0x7f))) {
      val png = MediaCodecs.png(64, 64, body)
      System.arraycopy(lenBytes, 0, png, 8, 4) // overwrite IHDR length field
      assert(HeaderDecoder.decode(1L, png).fmt === "unknown")
      // same corruption on a later chunk (IHDR intact → png still parses)
      val png2 = MediaCodecs.png(64, 64, body)
      System.arraycopy(lenBytes, 0, png2, 8 + 25, 4)
      val d = HeaderDecoder.decode(2L, png2)
      assert(d.fmt === "png" && d.width === 64)
      // WAV with a huge RIFF sub-chunk length (parseWav already Long-safe)
      val wav = MediaCodecs.wav(2, 22050, body)
      System.arraycopy(lenBytes, 0, wav, 16, 4)
      HeaderDecoder.decode(3L, wav) // must not throw
    }
  }

  test("decodeMedia over mediaWithHeaders: every doc parses to its generated dims") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val media = Multimodal.mediaWithHeaders(spark, docs)
    val dims = Multimodal.decodeMedia(spark, media).collect()
    assert(dims.length === docs.count())
    assert(!dims.exists(_.fmt === "unknown"), "all generated payloads must parse")
    dims.foreach { d =>
      (d.media_id % 3) match {
        case 0 =>
          assert(d.fmt === "png")
          assert(d.width === 16 + (d.media_id % 317).toInt, s"id=${d.media_id}")
          assert(d.height === 16 + (d.media_id * 7 % 211).toInt)
        case 1 =>
          assert(d.fmt === "wav")
          assert(d.channels === 1 + (d.media_id % 2).toInt)
          assert(d.sample_rate === 8000 * (1 + (d.media_id / 3 % 3)).toInt)
        case _ =>
          assert(d.fmt === "jpeg")
          assert(d.width === 16 + (d.media_id % 251).toInt)
          assert(d.height === 16 + (d.media_id * 5 % 173).toInt)
      }
    }
  }

  test("dedupMediaExact groups identical payloads across mime labels, keep = min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // constructed duplicate load: ids 0/3/6 share bytes (two mimes),
    // 1/4 share bytes (one mime), 2 and 5 are unique
    val media = Seq(
      (0L, "image/png", "same-bytes-A"),
      (3L, "video/mp4", "same-bytes-A"),
      (6L, "image/png", "same-bytes-A"),
      (1L, "audio/wav", "same-bytes-B"),
      (4L, "audio/wav", "same-bytes-B"),
      (2L, "image/png", "unique-C"),
      (5L, "video/mp4", "unique-D")
    ).toDF("media_id", "mime", "text")
      .select(col("media_id"), col("mime"),
        encode(col("text"), "UTF-8").as("payload"),
        length(col("text")).cast("long").as("n_bytes"))
    val groups = Multimodal.dedupMediaExact(media)
      .select("keep_id", "n_copies", "n_mimes", "n_bytes")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(groups === Array(
      (0L, 3L, 2L, 12L), // A: ids 0/3/6, png+mp4, keep 0
      (1L, 2L, 1L, 12L)  // B: ids 1/4, wav only, keep 1
    ), "unique payloads must not appear; cross-mime copies must group")

    val stats = Multimodal.mediaDedupStats(media)
      .select("mime_group", "n_media", "n_distinct", "n_dup_copies",
        "bytes_total", "bytes_dedup")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // ALL row dedups across mimes: 7 media, 4 distinct payloads
    assert(stats("ALL") === ("ALL", 7L, 4L, 3L, 12L * 5 + 8 + 8, 12L * 2 + 8 + 8))
    // per-mime png: ids 0/6 share A + unique C → 3 media, 2 distinct
    assert(stats("image/png") === ("image/png", 3L, 2L, 1L, 12L * 2 + 8, 12L + 8))
    // cross-mime duplication is only visible in ALL: per-mime distinct
    // sums to 2+1+2 = 5 > ALL's 4 (payload A counted under two mimes)
    assert(stats("image/png")._3 + stats("audio/wav")._3 + stats("video/mp4")._3 === 5L)
  }
}
