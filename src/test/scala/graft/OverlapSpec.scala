package graft

import java.security.MessageDigest

import graft.operators.Overlap
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // Two sources sharing a sentence: shingle sets overlap on the shared
  // run. A third source is disjoint.
  private lazy val docs = Seq(
    (1L, "srcA", "the quick brown fox jumps over the lazy dog"),
    (2L, "srcA", "pack my box with five dozen liquor jugs"),
    (3L, "srcB", "the quick brown fox jumps over a sleeping cat"),
    (4L, "srcC", "completely different tokens here entirely unrelated words")
  ).toDF("doc_id", "source", "text")

  /** Brute-force reference: exact word-3-gram shingle sets per source. */
  private def shingleSet(texts: Seq[String]): Set[String] =
    texts.flatMap { t =>
      val ws = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
    }.toSet

  test("k >= union size makes the KMV estimate exact") {
    val out = Overlap.sourceOverlap(docs, "source", "text", k = 256)
      .orderBy("src_a", "src_b").collect()
    val a = shingleSet(Seq(docs.collect()(0).getString(2), docs.collect()(1).getString(2)))
    val b = shingleSet(Seq("the quick brown fox jumps over a sleeping cat"))
    val c = shingleSet(Seq("completely different tokens here entirely unrelated words"))
    val expAB = (a.intersect(b).size.toLong * 1000000L) / a.union(b).size
    val Row(_, _, mAB: Long, dAB: Long, jAB: Long) = out(0)
    assert(dAB == a.union(b).size.toLong)
    assert(mAB == a.intersect(b).size.toLong)
    assert(jAB == expAB)
    // disjoint pairs estimate zero
    assert(out(1).getLong(4) == 0L && out(2).getLong(4) == 0L)
  }

  test("bounded k sketch matches the brute-force KMV formula") {
    val k = 4
    val out = Overlap.sourceOverlap(docs, "source", "text", k = k)
      .filter($"src_a" === "srcA" && $"src_b" === "srcB").collect()(0)
    val a = shingleSet(Seq(docs.collect()(0).getString(2), docs.collect()(1).getString(2)))
      .map(md5hex).toSeq.sorted.take(k)
    val b = shingleSet(Seq("the quick brown fox jumps over a sleeping cat"))
      .map(md5hex).toSeq.sorted.take(k)
    val kUnion = (a ++ b).distinct.sorted.take(k)
    val matched = kUnion.count(h => a.contains(h) && b.contains(h)).toLong
    assert(out.getAs[Long]("matched") == matched)
    assert(out.getAs[Long]("denom") == kUnion.size.toLong)
    assert(out.getAs[Long]("jaccard_ppm") == matched * 1000000L / kUnion.size)
  }

  test("sketch is invariant to partitioning (map-side combine determinism)") {
    val base = Overlap.sourceOverlap(docs, "source", "text", k = 4).collect().toSet
    val shuffled = Overlap.sourceOverlap(docs.repartition(7), "source", "text", k = 4)
      .collect().toSet
    assert(base == shuffled)
  }

  test("documents shorter than the shingle width contribute nothing") {
    val tiny = Seq((1L, "s1", "two words"), (2L, "s2", "also short")).toDF("doc_id", "source", "text")
    assert(Overlap.kmvSketches(tiny, "source", "text").count() == 0)
  }
}
