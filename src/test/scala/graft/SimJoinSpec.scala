package graft

import graft.operators.SimJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact prefix-filtered Jaccard self-join: completeness vs brute
 * force, threshold boundary exactness, degenerate-doc handling. */
class SimJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(
      docs: org.apache.spark.sql.DataFrame, tMilli: Int): Set[(Long, Long, Long, Long)] = {
    val sh = docs.select(col("doc_id").cast("long").as("id"),
        filter(split(col("text"), "[ \t\n\r]+"), w => w =!= "").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("id"), explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> concat_ws(' ', slice(ws, i, 3)))"))
        .as("tok"))
      .distinct()
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 1000 >= tMilli * uni
    } yield (a, b, inter, uni)).toSet
  }

  private def run(
      docs: org.apache.spark.sql.DataFrame, tMilli: Int): Set[(Long, Long, Long, Long)] =
    SimJoin.jaccardSelfJoin(docs, "doc_id", "text", tMilli)
      .select("id1", "id2", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("matches brute force exactly, including pairs at the threshold boundary") {
    // docs 1/2 share exactly 2 of 4 union shingles (jac = 0.5, ON the
    // t=500 boundary — must be INCLUDED); 3 is an exact dup of 1;
    // 4 is unrelated; 5 shares one shingle with 1 (below threshold)
    val docs = Seq(
      (1L, "a b c d e"),          // shingles: abc bcd cde
      (2L, "a b c d x"),          // abc bcd cdx → inter 2, uni 4 → 500
      (3L, "a b c d e"),          // identical to 1 → 1000
      (4L, "p q r s t"),
      (5L, "z z2 a b c")          // shares abc only
    ).toDF("doc_id", "text")
    for (t <- Seq(400, 500, 800, 1000)) {
      val got = run(docs, t)
      val want = brute(docs, t)
      assert(got == want, s"t=$t: got $got want $want")
    }
    assert(run(docs, 500).exists { case (a, b, _, _) => (a, b) == (1L, 2L) },
      "the exactly-at-threshold pair must be kept")
  }

  test("short and empty docs produce no shingles and no pairs") {
    val docs = Seq(
      (1L, "only two"), (2L, "only two"), (3L, ""), (4L, "one"),
      (5L, "a b c d"), (6L, "a b c d")
    ).toDF("doc_id", "text")
    val got = run(docs, 500)
    assert(got == Set((5L, 6L, 2L, 2L)),
      s"sub-shingle docs must pair with nothing: $got")
  }

  test("prefix filter loses nothing on a skewed corpus (hot shared shingle)") {
    // every doc shares the hot prefix "the same header"; only 10/11
    // and 20/21 are genuinely similar. Brute-force equality proves the
    // hot token (max df) never needs to enter the candidate join.
    val near = Seq(
      (10L, "the same header alpha beta gamma delta one"),
      (11L, "the same header alpha beta gamma delta two"),
      (20L, "the same header omega psi chi phi three"),
      (21L, "the same header omega psi chi phi four"))
    val noise = (100L to 140L).map(i =>
      (i, s"the same header unique$i filler$i content$i tail$i"))
    val docs = (near ++ noise).toDF("doc_id", "text")
    assert(run(docs, 500) == brute(docs, 500))
  }

  test("rejects a nonsensical threshold") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](SimJoin.jaccardSelfJoin(docs, "doc_id", "text", 0))
    intercept[IllegalArgumentException](SimJoin.jaccardSelfJoin(docs, "doc_id", "text", 1001))
  }

  test("mass duplication: identical-set collapse changes nothing in the pair set (r18)") {
    // every logical doc appears 4x (the replicated-corpus regime that
    // OOMed the 100x sf10 probe pre-collapse): the pair set must equal
    // brute force — all within-copy pairs at jac=1000 plus every
    // cross-copy expansion of the logical near-pair
    val logical = Seq(
      "a b c d e",          // near-pair with the next at t=500
      "a b c d x",
      "p q r s t")
    val docs = (for {
      (txt, li) <- logical.zipWithIndex
      rep <- 0 until 4
    } yield ((li * 10 + rep).toLong, txt)).toDF("doc_id", "text")
    for (t <- Seq(500, 800, 1000)) {
      val got = run(docs, t)
      val want = brute(docs, t)
      assert(got == want, s"t=$t: got ${got.size} want ${want.size}")
    }
    // jac_milli of a within-copy pair is exactly 1000
    val jac = SimJoin.jaccardSelfJoin(docs, "doc_id", "text", 800)
      .filter(col("id1") === 0L && col("id2") === 1L)
      .select("jac_milli").as[Long].head()
    assert(jac == 1000L)
  }
}
