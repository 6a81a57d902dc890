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

  test("describeHeaders parses PNG/WAV/JPEG headers from hand-built bytes (C12d)") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").sliding(2, 2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480, trailing garbage
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 02 000000") ++
      "garbage tail".getBytes("UTF-8")
    // WAV 44100 Hz stereo with a JUNK chunk BEFORE fmt (the chunk scan
    // must skip it; 44100 = 0xAC44 → LE '44AC')
    val wav = hx("52494646 24000000 57415645" +
      "4A554E4B 04000000 DEADBEEF" +
      "666D7420 10000000 0100 0200 44AC0000 00000000 0000 1000")
    // JPEG 320x200 with APP0+APP1 segments before SOF0 (segment scan)
    val jpg = hx("FFD8" + "FFE0 0010 4A46494600010100000100010000" +
      "FFE1 0008 457869660000" +
      "FFC0 0011 08 00C8 0140 03 011100 021101 031101") ++
      "tail".getBytes("UTF-8")
    // odd-sized chunk before fmt: the scan must apply the RIFF pad byte
    val wavOdd = hx("52494646 24000000 57415645" +
      "4C495354 03000000 AABBCC 00" + // size 3 + 1 pad byte
      "666D7420 10000000 0100 0100 803E0000 00000000 0000 0800") // 16000 Hz mono
    val garbage = "not a media file at all".getBytes("UTF-8")
    val truncPng = png.take(12)  // signature but no IHDR
    val truncJpg = hx("FFD8 FFE0 0010 4A464946") // dies mid-segment
    // padded-but-valid JPEG (r18): 0xFF fill bytes between segments
    // plus standalone TEM (0x01) and RST0 (0xD0) markers before SOF —
    // the scan must consume fills and zero-payload markers, not read
    // a bogus length from them
    val jpgPad = hx("FFD8" + "FFFF FFE0 0004 0000" +
      "FF01" + "FFD0" + "FFFFFF" +
      "FFC0 0011 08 0064 00C8 03 011100 021101 031101") ++
      "tail".getBytes("UTF-8") // 200x100
    // EOI before any SOF: classified jpeg, zero dims, scan STOPS
    val jpgEoi = hx("FFD8 FFD9 FFC0 0011 08 00C8 0140 03 011100 021101 031101")
    val rows = Seq(
      (1L, png), (2L, wav), (3L, jpg), (4L, wavOdd), (5L, garbage),
      (6L, truncPng), (7L, truncJpg), (8L, Array.emptyByteArray),
      (9L, jpgPad), (10L, jpgEoi))
      .toDF("id", "p")
    val got = Media.describeHeaders(rows, "id", "p")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) == ("png", 640L, 480L, 0L, 0L), s"png: ${got(1L)}")
    assert(got(2L) == ("wav", 0L, 0L, 44100L, 2L), s"wav: ${got(2L)}")
    assert(got(3L) == ("jpeg", 320L, 200L, 0L, 0L), s"jpeg: ${got(3L)}")
    assert(got(4L) == ("wav", 0L, 0L, 16000L, 1L), s"wav odd chunk: ${got(4L)}")
    assert(got(5L) == ("unknown", 0L, 0L, 0L, 0L))
    // truncated: classified by signature where one exists, zero fields,
    // and above all NO crash
    assert(got(6L) == ("unknown", 0L, 0L, 0L, 0L)) // PNG sig needs IHDR too
    assert(got(7L) == ("jpeg", 0L, 0L, 0L, 0L))
    assert(got(8L) == ("unknown", 0L, 0L, 0L, 0L))
    assert(got(9L) == ("jpeg", 200L, 100L, 0L, 0L), s"padded jpeg: ${got(9L)}")
    assert(got(10L) == ("jpeg", 0L, 0L, 0L, 0L), s"eoi-first jpeg: ${got(10L)}")
  }
}
