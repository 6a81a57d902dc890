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

  test("selectBatch: rank-window disjointness, conservative blocking, pick cap") {
    val cands = Seq(("a b", 10L), ("b c", 9L), ("c d", 8L), ("ab c", 7L),
      ("x y", 6L), ("y z", 5L), ("p q", 4L))
    // 'b c' blocked by 'a b' (b); 'c d' blocked by 'b c' even though
    // 'b c' itself was blocked (conservative rule); 'ab c' blocked by
    // 'a b' via its MERGED form; 'y z' blocked by 'x y'
    assert(Bpe.selectBatch(cands, 8) == Seq(("a b", 10L), ("x y", 6L), ("p q", 4L)))
    assert(Bpe.selectBatch(cands, 2) == Seq(("a b", 10L), ("x y", 6L)))
  }

  test("learnMergesBatched: one round of disjoint picks equals sequential " +
      "merges when the top pairs do not interact") {
    // two independent hot pairs in disjoint alphabets: the batch must
    // pick both in one round with the same counts sequential learning
    // would see
    val docs = Seq((1L, "ab ab ab xy xy")).toDF("doc_id", "text")
    val batched = Bpe.learnMergesBatched(docs, "text", rounds = 1, kBatch = 2)
    assert(batched.map(t => (t._3, t._5)) == Seq(("a b", 3L), ("x y", 2L)),
      s"got $batched")
    val seqential = Bpe.learnMerges(docs, "text", 2)
    assert(batched.map(t => (t._3, t._5)) ==
      seqential.map(t => (t._1, t._3)), s"batched $batched vs seq $seqential")
    // round/pick bookkeeping
    assert(batched.map(t => (t._1, t._2)) == Seq((1, 1), (1, 2)))
  }

  test("learnMergesBatched with kBatch=1 degenerates to sequential learnMerges") {
    // rank-1 always qualifies, so a 1-pick batch IS the sequential
    // trainer — the cross-round fold and counts must agree exactly
    val docs = Seq((1L, "newest newest newest"), (2L, "low lower lowest"))
      .toDF("doc_id", "text")
    val batched = Bpe.learnMergesBatched(docs, "text", rounds = 4, kBatch = 1)
    val sequential = Bpe.learnMerges(docs, "text", 4)
    assert(batched.map(t => (t._3, t._4, t._5)) == sequential,
      s"batched $batched vs sequential $sequential")
    assert(batched.map(_._1) == Seq(1, 2, 3, 4)) // one pick per round
  }
}
