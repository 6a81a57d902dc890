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

  test("exactDedup collapses byte-identical payloads onto the lowest id (C12c)") {
    val m = Seq(
      (10L, "same payload bytes"),
      (11L, "same payload bytes"),
      (12L, "different"),
      (13L, "same payload bytes")).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("p"))
    val got = Media.exactDedup(m, "id", "p")
      .select("media_id", "rep_id", "n_copies")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((10L, 10L, 3L), (11L, 10L, 3L),
      (12L, 12L, 1L), (13L, 10L, 3L)))
  }

  test("chunkSignatures drops partial tails and sub-chunk payloads") {
    val m = Seq((1L, "a" * 70), (2L, "b" * 20)).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("p"))
    val sigs = Media.chunkSignatures(m, "id", "p", chunkBytes = 32)
      .as[(Long, String)].collect()
    // 70 bytes → 2 full 32-byte chunks (identical → 1 distinct sig);
    // 20 bytes → none (and NOT a garbage descending-sequence chunk)
    assert(sigs.map(_._1).toSet == Set(1L))
    assert(sigs.length == 1)
  }

  test("nearDupPairs finds locally-edited payloads, stop-chunks bound fanout") {
    // every payload opens with the SAME 32-byte boilerplate chunk;
    // bodies: a = 8 distinct chunks, aEdit = a with the tail chunk
    // rewritten, c = unrelated
    def mk(seed: Int) = (0 until 256).map(i => ((i * 31 + seed) % 97 + 32).toChar).mkString
    val boiler = "H" * 32
    val a = boiler + mk(1)
    val aEdit = a.substring(0, a.length - 10) + "Y" * 10 // last chunk differs
    val c = boiler + mk(5)
    val m = Seq((1L, a), (2L, aEdit), (3L, c)).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("p"))
    // boilerplate chunk is in 3 media > cap 2 → dropped; (1,2) still
    // share 7 of their remaining 8 chunks → jaccard 7/9 = 777777 ppm;
    // (1,3)/(2,3) shared NOTHING once the boilerplate is gone
    val got = Media.nearDupPairs(m, "id", "p", 32, 2, 700000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 7L, 777777L)) ||
      got == Seq((2L, 1L, 7L, 777777L)), got.toString)
    // without the cap the boilerplate chunk DOES link unrelated media
    // (threshold 1 ppm): the cap is what kept them apart
    val uncapped = Media.nearDupPairs(m, "id", "p", 32, 100, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 3L)) || uncapped.contains((3L, 1L)))
  }
}
