package graft

import graft.operators.Ngrams
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class NgramsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    "the cat sat",
    "the cat ran",
    "cat",                       // shorter than n=2 → no bigrams
    "",                          // empty → nothing
    "  the   cat  sat  ",        // extra whitespace collapses
    "a\tb\nc"                    // tabs/newlines are separators
  ).toDF("text")

  test("ngrams emits exactly the adjacent word pairs") {
    val got = Ngrams.ngrams(docs, "text", 2).as[String].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map(
      "the cat" -> 3, "cat sat" -> 2, "cat ran" -> 1, "a b" -> 1, "b c" -> 1))
  }

  test("unigrams and trigrams degrade correctly at text boundaries") {
    val uni = Ngrams.ngrams(docs, "text", 1).as[String].collect()
    assert(uni.count(_ == "cat") == 4)
    val tri = Ngrams.ngrams(Seq("a b c d", "x y").toDF("text"), "text", 3)
      .as[String].collect().toSet
    assert(tri == Set("a b c", "b c d"), "2-word text yields no trigram")
  }

  test("topNgrams ranks by count with deterministic tie-break") {
    val top = Ngrams.topNgrams(docs, "text", 2, 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("the cat", 3L), ("cat sat", 2L), ("a b", 1L)),
      s"ties broken by ngram text: $top")
  }

  test("wordNgrams matches a plain-Scala reference on fuzzed whitespace layouts") {
    val rnd = new scala.util.Random(0xD1CE)
    val seps = Array(" ", "\t", "\n", "\r", "  ", " \n ", "\r\n")
    val toks = Array("a", "bc", "def", "Ü", "x_1", "!?", "长")
    val texts = Seq.fill(120) {
      val n = rnd.nextInt(8)
      (if (rnd.nextBoolean()) seps(rnd.nextInt(seps.length)) else "") +
        Seq.fill(n)(toks(rnd.nextInt(toks.length))).mkString(
          seps(rnd.nextInt(seps.length))) +
        (if (rnd.nextBoolean()) seps(rnd.nextInt(seps.length)) else "")
    }
    def ref(text: String, n: Int): Seq[String] = {
      val ws = text.split("[ \t\n\r]+").filter(_.nonEmpty).toSeq
      if (ws.length < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq
    }
    for (n <- 1 to 3) {
      val got = texts.toDF("text")
        .select(graft.functions.expressions.wordNgrams(col("text"), n).as("g"))
        .as[Seq[String]].collect().toSeq
      assert(got == texts.map(ref(_, n)), s"n=$n")
    }
  }

  test("topNgrams plans a partial aggregate and a take-ordered limit, not a full sort") {
    val plan = Ngrams.topNgrams(docs, "text", 2, 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }

  test("oovStats: hand-checked vocabulary threshold and per-source rollup") {
    import spark.implicits._
    // global counts: "the"=4 (vocab at min 3), "rare"=2 (oov), "x"=1 (oov)
    val docs = Seq(
      ("s1", "the the rare"),
      ("s1", null.asInstanceOf[String]),       // null text: zero tokens
      ("s2", "the the rare x")
    ).toDF("source", "text")
    val got = Ngrams.oovStats(docs, "source", "text", minCount = 3L)
      .select("source", "n_tokens", "n_distinct", "oov_occurrences",
        "n_oov_types", "oov_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("s1", 3L, 2L, 1L, 1L, 333333L),
      ("s2", 4L, 3L, 2L, 2L, 500000L)))
  }

  test("oovStats is partitioning-invariant") {
    import spark.implicits._
    val docs = (0 until 300).map(i => (s"s${i % 3}", s"tok${i % 40} tok${i % 7} filler"))
    val a = Ngrams.oovStats(docs.toDF("source", "text"), "source", "text", 5L)
      .collect().map(_.toString).toSet
    val b = Ngrams.oovStats(docs.reverse.toDF("source", "text").repartition(13),
      "source", "text", 5L).collect().map(_.toString).toSet
    assert(a == b)
  }
}
