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
}
