package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges picks weighted best pairs with deterministic tie-breaks") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // round 1 pair counts: (l o)=7, (o w)=7, (e s)=9, (s t)=9, (w e)=8 ...
    // best = "e s" (9, lex before "s t"); round 2: "es t" -> "est" (9)
    val docs = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 3)
    assert(merges(0) == (("e s", "es", 9L)), s"got ${merges(0)}")
    assert(merges(1) == (("es t", "est", 9L)), s"got ${merges(1)}")
    // round 3: "l o"=7, "o w"=7, "w est"=... newest has (w est)=6, widest (d est)=3,
    // (n e)=6, (e w)=6, (w i)=3, (i d)=3, (l o)=7, (o w)=7 -> best "l o" (7, lex)
    assert(merges(2) == (("l o", "lo", 7L)), s"got ${merges(2)}")
  }

  test("replace-count semantics on runs: 'a a a' counts one mergeable pair") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, "text", 1)
    assert(m(0) == (("a a", "aa", 1L)), s"got ${m(0)}")
  }

  test("segmentReport compresses exactly by the learned merges") {
    // vocab: newest x2, low x1, widest x1 → round 1 "e s" (3, lex over
    // "s t"), round 2 "es t" (3, unambiguous — every other pair ≤ 2)
    val docs = Seq((1L, "newest newest"), (2L, "low widest")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 2)
    assert(merges.map(_._2) == Seq("es", "est"), s"got $merges")
    val rep = Bpe.segmentReport(docs, "doc_id", "text", merges.map(_._1))
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toList
    // doc 1: 2 words x 6 chars = 12 before; "n e w est" = 4 tokens x2 = 8
    // doc 2: low (3 -> 3) + widest (6 -> "w i d est" = 4): 9 before, 7 after
    assert(rep == List((1L, 2L, 12L, 8L), (2L, 2L, 9L, 7L)), s"got $rep")
  }
}
