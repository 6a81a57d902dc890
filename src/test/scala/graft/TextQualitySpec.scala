package graft

import graft.functions.{HashOps, expressions => fx}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** C88 Luhn PAN audit, C89 Gopher top-n-gram filter, C90 hashed
 * linear classifier — kernel-level vectors plus DataFrame plumbing. */
class TextQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- C88: Luhn ----

  test("luhnValid accepts known-good PANs and rejects off-by-one checksums") {
    val got = Seq(
      "4532015112830366", // valid 16-digit Visa test number
      "79927398713",      // the classic Luhn example (valid)
      "4532015112830367", // last digit bumped: invalid
      "79927398710",      // classic example with wrong check digit
      "0000000000000",    // 13 zeros: sum 0, valid by mod-10
      "1111111111111")    // 13 ones: doubles make 1+2 pattern, invalid
      .toDF("d").select(graft.text.Pii.luhnValid(col("d"))).as[Boolean].collect()
    assert(got.toSeq == Seq(true, true, false, false, true, false))
  }

  test("panAudit: length envelope, multiple candidates, fold-replace redaction") {
    // 79927398713 is valid but 11 digits — OUTSIDE the PAN length
    // envelope, so it must not even be a candidate
    val text = "pay 4532015112830366 or 79927398713 ref 0000000000000 " +
      "bogus 4532015112830367 tail"
    val row = Seq((1L, text)).toDF("id", "t")
    val got = graft.text.Pii.panAudit(row, "id", "t")
      .as[(Long, Long, Long, String, String)].head()
    assert(got._2 == 3L, s"candidates: $got")
    // only the two checksum-passing in-envelope runs are PII
    assert(got._3 == 2L)
    assert(got._4 == "0000000000000,4532015112830366")
    assert(got._5 == "pay <PAN> or 79927398713 ref <PAN> bogus 4532015112830367 tail")
  }

  // ---- C89: Gopher top-n-gram ppm ----

  test("gopherTopNgramPpm: hand-computed counts, tie-break, short-text zeros") {
    // "a b a b a b": 11 chars, tokens [a b a b a b]
    //  2-grams: "a b"x3, "b a"x2        -> 3*3*1e6/11  = 818181
    //  3-grams: "a b a"x2 = "b a b"x2   -> tie, lex-smallest "a b a":
    //                                      2*5*1e6/11  = 909090
    //  4-grams: "a b a b"x2, "b a b a"  -> 2*7*1e6/11  = 1272727
    //  (overlapping occurrences can push the signal past 1e6 — the
    //  published count*len/len form, deliberately uncapped)
    val got = HashOps.gopherTopNgramPpm(UTF8String.fromString("a b a b a b"), 2, 4)
    assert(got.toSeq == Seq(818181L, 909090L, 1272727L))
    // fewer tokens than n -> 0 for that n; empty text -> all zeros
    // "one two": exactly one 2-gram covering the whole 7-char text
    assert(HashOps.gopherTopNgramPpm(UTF8String.fromString("one two"), 2, 4)
      .toSeq == Seq(1000000L, 0L, 0L))
    assert(HashOps.gopherTopNgramPpm(UTF8String.fromString(""), 2, 4)
      .toSeq == Seq(0L, 0L, 0L))
  }

  test("gopherTopPpm expression matches the kernel through codegen") {
    val got = Seq("x y x y x y z", "solo")
      .toDF("t").select(fx.gopherTopPpm(col("t"), 2, 3)).as[Seq[Long]].collect()
    assert(got(0) == HashOps.gopherTopNgramPpm(
      UTF8String.fromString("x y x y x y z"), 2, 3).toSeq)
    assert(got(1) == Seq(0L, 0L))
  }

  // ---- C90: hashed linear classifier ----

  test("hashedLinearScore: per-occurrence sum, case folding, empty text") {
    def fnv(tok: String): Long = {
      var h = 0xcbf29ce484222325L
      tok.foreach { ch => h ^= ch.toLong; h *= 0x100000001b3L }
      h
    }
    def w(tok: String): Long = {
      val b = java.lang.Long.remainderUnsigned(fnv(tok), 65536L)
      java.lang.Long.remainderUnsigned(
        HashOps.mix64(b ^ 1442695040888963407L), 2001L) - 1000L
    }
    val s = UTF8String.fromString("alpha beta alpha")
    assert(HashOps.hashedLinearScore(s, 65536L, 1442695040888963407L) ==
      2 * w("alpha") + w("beta"))
    // tokenizer lowers: "ALPHA" scores as "alpha"
    assert(HashOps.hashedLinearScore(UTF8String.fromString("ALPHA"),
      65536L, 1442695040888963407L) == w("alpha"))
    assert(HashOps.hashedLinearScore(UTF8String.fromString("  ,;  "),
      65536L, 1442695040888963407L) == 0L)
  }

  test("hashedLinearScore expression rides codegen and is seed-sensitive") {
    val df = Seq("the quick brown fox").toDF("t")
    val a = df.select(fx.hashedLinearScore(col("t"), 65536L, 1L)).as[Long].head()
    val b = df.select(fx.hashedLinearScore(col("t"), 65536L, 2L)).as[Long].head()
    assert(a != b) // different weight tables
    val k = HashOps.hashedLinearScore(
      UTF8String.fromString("the quick brown fox"), 65536L, 1L)
    assert(a == k)
  }
}
