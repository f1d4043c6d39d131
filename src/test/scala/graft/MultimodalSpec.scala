package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline

/** multimodal plumbing: binary columns + partition-parallel stub decode */
class MultimodalSpec extends AnyFunSuite {

  test("feature extraction preserves rows and computes byte-exact features") {
    val spark = TestSpark.spark
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    val feats = MediaPipeline.extractFeatures(media).collect()
    val docs = graft.Tables.documents(spark, TestSpark.Sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.length == docs.size)
    feats.foreach { f =>
      val bytes = docs(f.media_id).getBytes("UTF-8")
      assert(f.n_bytes == bytes.length)
      val (hist, brightness) = MediaPipeline.FakeDecoder.decode(bytes)
      assert(f.histogram.toSeq == hist.toSeq)
      assert(math.abs(f.brightness - brightness) < 1e-12)
      assert(f.histogram.sum == f.n_bytes) // histogram covers every byte
    }
  }

  test("kind profile aggregates all three modalities") {
    val prof = MediaPipeline.kindProfile(TestSpark.spark, TestSpark.Sf).collect()
    assert(prof.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(prof.map(_.getLong(1)).sum == 500)
  }

  test("resize stub shrinks payloads deterministically to the target raster") {
    val spark = TestSpark.spark
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    val resized = MediaPipeline.resize(media, 8, 8).collect()
    assert(resized.length == 500)
    resized.foreach { r =>
      assert(r.width == 8 && r.height == 8)
      assert(r.bytes.length <= 64 && r.bytes.nonEmpty)
    }
    // deterministic: same input → same bytes
    val again = MediaPipeline.resize(media, 8, 8).collect()
      .map(r => r.media_id -> r.bytes.toSeq).toMap
    resized.foreach(r => assert(again(r.media_id) == r.bytes.toSeq))
  }

  test("frame sampling keeps every k-th frame window of video payloads") {
    val spark = TestSpark.spark
    val media = MediaPipeline.mediaTable(spark, TestSpark.Sf)
    val nVideo = media.filter(_.kind == "video").count()
    val sampled = MediaPipeline.sampleFrames(media, frames = 10, everyK = 2).collect()
    assert(sampled.length == nVideo)
    sampled.foreach { f =>
      assert(f.kind == "video")
      assert(f.n_bytes > 0)
      assert(f.histogram.sum == f.n_bytes)
    }
  }

  test("multimodal_meta query matches the pipeline's byte counts") {
    val spark = TestSpark.spark
    val q = SparkEntry.queries("multimodal_meta")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = MediaPipeline.extractFeatures(
      MediaPipeline.mediaTable(spark, TestSpark.Sf)).collect()
    feats.foreach(f => assert(q(f.media_id) == f.n_bytes))
  }
}
