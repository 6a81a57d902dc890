package graft

import graft.multimodal.Media
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image-ish payload of text"),
    (1L, "an audio-ish payload"),
    (2L, "x" * 100)).toDF("doc_id", "text")

  test("fromDocuments builds typed media records with binary payloads") {
    val media = Media.fromDocuments(docs).collect().sortBy(_.media_id)
    assert(media.map(_.kind).toSeq == Seq("image", "audio", "image"))
    assert(media(0).payload.toSeq == "an image-ish payload of text".getBytes("UTF-8").toSeq)
    assert(media(1).sample_rate == 16000 && media(0).sample_rate == 0)
  }

  test("extractFeatures is deterministic, batched per partition, fixed-width") {
    val m = Media.fromDocuments(docs)
    val f1 = Media.extractFeatures(m).collect().sortBy(_.media_id)
    val f2 = Media.extractFeatures(m).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length == 8))
    assert(f1(2).n_bytes == 100L)
  }

  test("null text yields an empty payload, not an NPE") {
    val withNull = Seq((0L, "ok"), (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val feats = Media.extractFeatures(Media.fromDocuments(withNull))
      .collect().sortBy(_.media_id)
    assert(feats.length == 2)
    assert(feats(1).n_bytes == 0L && feats(1).features.forall(_ == 0.0f))
  }

  test("sampleFrames splits payloads and keeps every Nth frame") {
    val frames = Media.sampleFrames(Media.fromDocuments(docs), frameBytes = 10, everyN = 2)
      .filter($"media_id" === 2L).collect()
    // 100 bytes → 10 frames of 10 → every 2nd → 5 frames (idx 0,2,4,6,8)
    assert(frames.length == 5)
    assert(frames.map(_.getLong(1)).sorted.toSeq == Seq(0L, 2L, 4L, 6L, 8L))
  }
}
