package graft

import graft.functions.expressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C67: content-defined chunking checked against an independent
  * per-window Horner evaluation (no rolling update), plus the
  * properties that are the operator's reason to exist: lossless
  * reassembly and boundary re-alignment after an insertion. */
class CdcChunkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 1000000007L

  /** Independent reference: hash every window from scratch (Horner),
    * cut after windows with H mod div == rem, slice on code points. */
  private def refChunks(t: String, w: Int = 16, div: Long = 32L,
      rem: Long = 9L): List[String] = {
    val cps = t.codePoints.toArray
    val n = cps.length
    if (n < w || n == 0) return List(t)
    def hw(p: Int): Long = {
      var h = 0L
      var j = 0
      while (j < w) { h = (h * 257L + cps(p + j)) % M; j += 1 }
      h
    }
    val cuts = (0 to n - w).filter(p => hw(p) % div == rem)
      .map(_ + w).filter(_ < n)
    val bounds = 0 +: cuts :+ n
    bounds.sliding(2).map { case Seq(a, b) =>
      val sb = new java.lang.StringBuilder
      (a until b).foreach(i => sb.appendCodePoint(cps(i)))
      sb.toString
    }.toList
  }

  private def sparkChunks(texts: Seq[String]): Map[String, List[String]] =
    texts.toDF("t")
      .select(col("t"), expressions.cdcChunks(col("t")).as("c"))
      .as[(String, List[String])].collect().toMap

  test("chunks match the independent Horner reference on varied ASCII text") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "the", "a")
    val texts = (0 until 60).map { _ =>
      (0 until (rnd.nextInt(80) + 5)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val got = sparkChunks(texts)
    texts.foreach { t =>
      assert(got(t) == refChunks(t), s"chunks of '${t.take(40)}...'")
      assert(got(t).mkString == t, "chunks must reassemble losslessly")
      assert(got(t).forall(_.nonEmpty), "chunks are never empty")
    }
  }

  test("unicode text chunks on code points, matches reference") {
    val texts = Seq(
      "数据 处理 引擎 数据 处理 引擎 数据 处理 引擎 spark 数据 处理",
      "café résumé naïve café résumé naïve café résumé naïve encore",
      "a🙂b🙂c🙂d🙂e🙂f🙂g🙂h🙂i🙂j🙂k🙂l🙂m🙂n🙂o🙂p🙂")
    val got = sparkChunks(texts)
    texts.foreach { t =>
      assert(got(t) == refChunks(t), s"unicode chunks of '${t.take(20)}'")
      assert(got(t).mkString == t)
    }
  }

  test("degenerates: empty and shorter-than-window texts are one chunk") {
    val got = sparkChunks(Seq("", "short", "exactly 15 chars"))
    assert(got("") == List(""))
    assert(got("short") == List("short"))
    assert(got("exactly 15 chars") == List("exactly 15 chars"))
  }

  test("insertion re-aligns every chunk after the edit (the CDC property)") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 120).map(_ =>
      Seq("alpha", "beta", "gamma", "delta")(rnd.nextInt(4))).mkString(" ")
    val shifted = "INSERTED PREFIX of odd length! " + base
    val Seq(c1, c2) = Seq(base, shifted).map(t => refChunks(t))
    val got = sparkChunks(Seq(base, shifted))
    assert(got(base) == c1 && got(shifted) == c2)
    assert(c1.size >= 3, "test needs a multi-chunk base text")
    // every chunk of the base after its FIRST boundary re-appears
    // verbatim at the tail of the shifted text's chunking
    assert(c2.takeRight(c1.size - 1) == c1.tail,
      "post-edit chunks must re-align identically")
  }

  test("cdc_chunks is SQL-registered via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cdc_chunks('the quick brown fox jumps over the lazy dog and runs far away') AS c")
      .as[List[String]].head()
    assert(r == refChunks(
      "the quick brown fox jumps over the lazy dog and runs far away"))
  }
}
