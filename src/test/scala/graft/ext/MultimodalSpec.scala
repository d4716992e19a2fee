package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Multimodal.attachSyntheticMedia(
    (0L until 20L).toDF("doc_id"), "doc_id")

  test("synthetic media: binary payload + typed metadata struct, deterministic") {
    val r = base.select($"media", $"media_meta.media_type", $"media_meta.n_frames").head()
    assert(r.getAs[Array[Byte]](0).nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getString(1)))
    val a = base.select(sha2($"media", 256)).as[String].collect().sorted
    val b = base.select(sha2($"media", 256)).as[String].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("extractFeatures: schema adds array<float> of requested dim; deterministic per payload") {
    val out = Multimodal.extractFeatures(base, "media", dim = 8)
    assert(out.schema("features").dataType.typeName === "array")
    val feats = out.select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length === 8))
    val again = Multimodal.extractFeatures(base, "media", dim = 8)
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats === again)
    // different payloads -> different features
    assert(feats(0L) !== feats(1L))
  }

  test("frameSample explodes stride-spaced frames bounded by n_frames") {
    val out = Multimodal.frameSample(base, "media", "media_meta", stride = 5)
    val counts = out.groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nFrames = base.select($"doc_id", $"media_meta.n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts.foreach { case (id, c) =>
      val expected = (nFrames(id) + 4) / 5 // ceil(n_frames/stride)
      assert(c === expected, s"doc $id: $c frames, n_frames=${nFrames(id)}")
    }
    assert(out.schema("frame_bytes").dataType.typeName === "binary")
  }

  test("resizeMedia adds a thumbnail digest of the payload") {
    val out = Multimodal.resizeMedia(base, "media", 64, 64)
    val thumbs = out.select($"thumbnail").collect().map(_.getAs[Array[Byte]](0))
    assert(thumbs.forall(t => t != null && t.length === 64))
  }
}
