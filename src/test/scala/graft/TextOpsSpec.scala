package graft

import graft.functions.TextFunctions
import graft.text.{Decontaminate, TfIdf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii scrubs urls, emails, and phones; leaves clean text alone") {
    val got = Seq(
      "mail me at a.b+c@ex-ample.org today",
      "see https://host.example.com/p?q=1#f and http://x.io",
      "call +44-123-4567 now",
      "no pii here, just words",
      "edge: a@b.co https://u@pw.example.com/x +1-555-0000")
      .toDF("t").select(TextFunctions.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail me at [EMAIL] today")
    assert(got(1) == "see [URL] and [URL]")
    assert(got(2) == "call [PHONE] now")
    assert(got(3) == "no pii here, just words")
    // URL pass runs first, so the user-info email inside the URL is gone
    assert(got(4) == "edge: [EMAIL] [URL] [PHONE]")
  }

  test("extractDomain pulls the host of the first url") {
    val got = Seq("pre https://a.example.org/path more http://b.io", "no url")
      .toDF("t").select(TextFunctions.extractDomain(col("t"))).as[String].collect()
    assert(got.toSeq == Seq("a.example.org", ""))
  }

  test("markContaminated flags exactly the docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),     // shares the full 3-gram chain
      (2L, "alpha beta something else"),  // shares no 3-gram
      (3L, "x y z")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val got = Decontaminate.markContaminated(train, bench, "doc_id", "text", 3)
      .as[(Long, Long, Boolean)].collect().toMap2
    assert(got == Map(1L -> (1L, true), 2L -> (0L, false), 3L -> (0L, false)))
  }

  test("exciseContaminated cuts hit spans, merges overlaps, keeps clean docs raw") {
    val train = Seq(
      // one hit: 3-gram "alpha beta gamma" at token 1 → tokens 1..3 cut
      (1L, "intro alpha beta gamma outro tail"),
      // two OVERLAPPING hits (grams at 0 and 1) → tokens 0..3 cut once
      (2L, "alpha beta gamma epsilon rest"),
      // clean doc: original text preserved verbatim (odd spacing intact)
      (3L, "x  y\tz"),
      // fully covered doc → empty text, all tokens counted removed
      (4L, "alpha beta gamma")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma"), (101L, "beta gamma epsilon"))
      .toDF("doc_id", "text")
    val got = Decontaminate.exciseContaminated(train, bench, "doc_id", "text", 3)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ("intro outro tail", 3L),
      2L -> ("rest", 4L),
      3L -> ("x  y\tz", 0L),
      4L -> ("", 3L)), s"got $got")
  }

  test("exciseDuplicateSpans keeps one canonical copy of a hot gram, cuts the rest") {
    val docs = Seq(
      // canonical home of "a b c" (lowest (doc, pos)) → untouched
      (1L, "a b c tail1"),
      // non-canonical occurrence at pos 1 → tokens 1..3 cut
      (2L, "pre a b c tail2"),
      // fully covered → empty, 3 removed
      (3L, "a b c"),
      // no hot gram → original text
      (4L, "unique words only here"),
      // fewer than n tokens → emits no grams, untouched
      (5L, "x y"),
      // TWO non-canonical occurrences (pos 0 and 3) cover everything;
      // the in-doc grams "b c a"/"c a b" stay below minCount
      (6L, "a b c a b c")).toDF("doc_id", "text")
    val got = graft.text.DupSpans
      .exciseDuplicateSpans(docs, "doc_id", "text", n = 3, minCount = 2L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ("a b c tail1", 0L),
      2L -> ("pre tail2", 3L),
      3L -> ("", 3L),
      4L -> ("unique words only here", 0L),
      5L -> ("x y", 0L),
      6L -> ("", 6L)), s"got $got")
  }

  test("tfidf ranks rarer terms above common ones at equal tf") {
    val docs = Seq(
      (1L, "common rare1"),
      (2L, "common rare2"),
      (3L, "common filler")).toDF("doc_id", "text")
    val top = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'common' is in every doc (df=3); each rare term is df=1 → wins
    assert(top(1L) == "rare1" && top(2L) == "rare2" && top(3L) == "filler")
  }

  test("bm25 gives higher weight to rare terms and saturates tf") {
    val docs = Seq(
      (1L, "rare common common common common"),
      (2L, "common common"),
      (3L, "common other")).toDF("doc_id", "text")
    val rows = TfIdf.bm25(docs, "doc_id", "text")
      .as[(Long, String, Long, Double)].collect()
    val byKey = rows.map(r => (r._1, r._2) -> r._4).toMap
    assert(byKey((1L, "rare")) > byKey((1L, "common")),
      "df=1 term must outscore the everywhere-term in the same doc")
    assert(rows.forall(_._4 >= 0.0))
  }

  test("bm25Ppm matches a BigInt replay of the fixed-point formula and keeps per-term ranking") {
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common rare2"),
      (3L, "common other rare2 rare2 filler"),
      (4L, "common common common common common")).toDF("doc_id", "text")
    def toks(t: String) = t.split("[ \t\n\r]+").filter(_.nonEmpty).toSeq
    val corpus = Seq(
      1L -> "rare common common common", 2L -> "common common rare2",
      3L -> "common other rare2 rare2 filler",
      4L -> "common common common common common")
    val tf = corpus.flatMap { case (d, t) => toks(t).map(d -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dl = corpus.map { case (d, t) => d -> toks(t).size.toLong }.toMap
    val dfm = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = corpus.size.toLong
    val s = dl.values.sum
    def expected(d: Long, term: String): Long = {
      val (t, w, l) = (BigInt(tf((d, term))), BigInt(dfm(term)), BigInt(dl(d)))
      val num = BigInt(1000000L) * (2 * n - 2 * w + 1) * 22 * t * s
      val den = (2 * w + 1) * (BigInt(10) * s * t + 3 * s + 9 * l * n)
      (num / den).toLong
    }
    val fixed = graft.text.TfIdf.bm25Ppm(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
    fixed.foreach { case (d, term, _, got) =>
      assert(got == expected(d, term), s"($d, $term)")
    }
    // per-term document ranking agrees with classic ln-idf bm25
    // (idf is constant within a term, so only the shared tf-part ranks)
    val classic = graft.text.TfIdf.bm25(docs, "doc_id", "text")
      .as[(Long, String, Long, Double)].collect()
    classic.map(_._2).distinct.foreach { term =>
      val c = classic.filter(_._2 == term).sortBy(r => (-r._4, r._1)).map(_._1).toSeq
      val f = fixed.filter(_._2 == term).sortBy(r => (-r._4, r._1)).map(_._1).toSeq
      assert(c == f, s"term $term: classic $c vs fixed $f")
    }
    // multi-term retrieval: doc 3 holds the rarest terms at highest tf
    val top = graft.text.TfIdf
      .bm25TopK(docs, "doc_id", "text", Seq("rare2", "other"), 2)
      .as[(Long, Long, Long)].collect()
    assert(top.head._1 == 3L && top.head._2 == 2L)
  }

  test("sortStructArray orders exactly like array_sort on mixed types with nulls/NaN") {
    val rnd = new scala.util.Random(0xBEEF)
    val rows = Seq.tabulate(400) { i =>
      (i % 7L,
       if (rnd.nextInt(10) == 0) null else rnd.nextInt(5).toString,
       rnd.nextInt(5) match {
         case 0 => Double.NaN
         case 1 => -0.0d // Spark SQL ordering: -0.0 == 0.0, ties break on later fields
         case 2 => 0.0d
         case n => n.toDouble
       },
       rnd.nextBoolean())
    }
    val df = rows.toDF("k", "s", "d", "b")
      .groupBy(lit(1))
      .agg(collect_list(struct(col("k"), col("s"), col("d"), col("b"))).as("a"))
    val native = df.select(graft.functions.expressions.sortStructArray(col("a")))
      .collect()(0).getSeq[Any](0)
    val builtin = df.select(array_sort(col("a")))
      .collect()(0).getSeq[Any](0)
    assert(native == builtin)
  }

  test("normalizeText: NFC composes, NFKC folds compatibility chars") {
    import graft.functions.expressions.normalizeText
    val rows = Seq(
      "café",          // decomposed e + combining acute
      "Å",              // Angstrom sign: NFC → U+00C5
      "① ﬁ",       // circled one + fi ligature: NFKC-only folds
      "already plain ascii")
      .toDF("t")
      .select(
        normalizeText(col("t"), "NFC").as("nfc"),
        normalizeText(col("t"), "NFKC").as("nfkc"))
      .as[(String, String)].collect()
    assert(rows(0) == (("café", "café")))
    assert(rows(1) == (("Å", "Å")))
    assert(rows(2)._1 == "① ﬁ")     // NFC leaves compatibility chars
    assert(rows(2)._2 == "1 fi")              // NFKC folds them
    assert(rows(3) == (("already plain ascii", "already plain ascii")))
  }

  test("normalizeText: strip → fold → collapse order and null safety") {
    import graft.functions.expressions.normalizeText
    val rows = Seq(
      Some("  Voilà,\tNAÏVE Ångström  text \n"),
      Some("ÁBC"),     // decomposed mark on an UPPERCASE base
      None)
      .toDF("t")
      .select(normalizeText(col("t"), "NFC", stripAccents = true,
        caseFold = true, collapseWs = true).as("n"))
      .as[Option[String]].collect()
    assert(rows(0).contains("voila, naive angstrom text"))
    // strip runs on the normalized form, before folding: Á → A → a
    assert(rows(1).contains("abc"))
    assert(rows(2).isEmpty)
  }

  test("normalizeText ASCII fast path is byte-identical to the full path") {
    import graft.functions.expressions.normalizeText
    // pure-ASCII rows take the skip-normalization branch; fold+collapse
    // must still run there
    val got = Seq("  MiXeD   CaSe\tText  ")
      .toDF("t")
      .select(normalizeText(col("t"), "NFKC", stripAccents = true,
        caseFold = true, collapseWs = true).as("n"))
      .as[String].collect()
    assert(got(0) == "mixed case text")
  }

  test("docSurprisal matches the hand-computed bit-length formula") {
    // counts: a=2 b=2 c=1, total=5 → bits_total=3; bitlen: a,b→2 c→1
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "   ")).toDF("doc_id", "text")
    val got = graft.text.Surprisal.docSurprisal(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "surprisal_sum", "surprisal_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // d1: (3-2)+(3-2)+(3-2)=3 over 3 tokens; d2: (3-2)+(3-1)=3 over 2
    // d3 has no tokens and is absent
    assert(got == Seq((1L, 3L, 3L, 1000L), (2L, 2L, 3L, 1500L)))
  }

  test("docBigramSurprisal: seen, backoff, and unseen-unigram branches by hand") {
    // train doc: "a b a b c" → uni: a=2 b=2 c=1 (N=5, bits_n=3);
    // bigrams: (a,b)=2 (b,a)=1 (b,c)=1.
    val train = Seq((0L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"),  // (a,b) seen: 2-2=0... bits(cu1=2)=2, bits(cb=2)=2 → 0;
                      // (b,c) seen: bits(2)-bits(1)=1
      (2L, "c a"),    // (c,a) UNSEEN bigram, a seen → 1 + 3 - bits(2) = 2
      (3L, "a z"),    // (a,z) unseen bigram, z unseen unigram → 1 + 3 - 0 = 4
      (4L, "a")       // no bigrams → absent
    ).toDF("doc_id", "text")
    val got = graft.text.Surprisal.docBigramSurprisal(score, train)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "surprisal_sum", "surprisal_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 500L), (2L, 1L, 2L, 2000L), (3L, 1L, 4L, 4000L)))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("blocklist termHits: weighted severity, zero-hit retention, case fold") {
    val docs = Seq(
      ("d1", "Leak LEAK leak spam ok"),    // leak x3 (case-folded), spam x1
      ("d2", "all clean words here"),      // zero hits — must survive
      ("d3", "spam spam spam spam"),       // 4 low-severity hits
      ("d4", "leak, spam; leak!")          // punctuation-split tokens
    ).toDF("doc_id", "text")
    val terms = Seq(("leak", 5L), ("spam", 1L)).toDF("term", "severity")
    val got = graft.text.Blocklist
      .termHits(docs, "doc_id", "text", terms, flagThreshold = 5L)
      .select("doc_id", "n_flag_terms", "n_flag_hits", "weighted_hits",
        "max_severity", "flagged")
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1).toList
    assert(got == List(
      ("d1", 2L, 4L, 16L, 5L, true),   // 3*5 + 1*1
      ("d2", 0L, 0L, 0L, 0L, false),
      ("d3", 1L, 4L, 4L, 1L, false),   // below threshold
      ("d4", 2L, 3L, 11L, 5L, true)))  // 2*5 + 1, exact threshold edge above
  }

  test("commonPrefixLen: reference equality, surrogate safety, group identity") {
    def ref(a: String, b: String): Long = {
      val ca = a.codePoints.toArray
      val cb = b.codePoints.toArray
      ca.zip(cb).takeWhile { case (x, y) => x == y }.length.toLong
    }
    val cases = Seq(
      ("", ""), ("", "abc"), ("abc", "abc"), ("abcdef", "abcxyz"),
      ("the quick brown", "the quick brawn"),
      ("a🙂x", "a🙂y"),   // shared emoji, then diverge
      ("a🙂", "a🙃"),     // emojis sharing a HIGH surrogate
      ("数据处理", "数据引擎"))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.expressions.commonPrefixLen(col("a"), col("b"))
          .as("l"))
      .as[(String, String, Long)].collect()
    got.foreach { case (a, b, l) =>
      assert(l == ref(a, b), s"lcp('$a', '$b')")
    }
    // the aggregate identity: lcp of a group == lcp(min, max)
    val grp = Seq("prefix shared alpha", "prefix shared beta",
      "prefix shunned gamma", "prefix shared omega")
    val direct = grp.combinations(2).map { case Seq(x, y) => ref(x, y) }.min
    assert(ref(grp.min, grp.max) == direct)
  }

  test("blocklist termHits: threshold boundary is >= (inclusive)") {
    val docs = Seq(("a", "bad bad"), ("b", "bad")).toDF("doc_id", "text")
    val terms = Seq(("bad", 2L)).toDF("term", "severity")
    val got = graft.text.Blocklist
      .termHits(docs, "doc_id", "text", terms, flagThreshold = 4L)
      .select("doc_id", "flagged").as[(String, Boolean)]
      .collect().toMap
    assert(got == Map("a" -> true, "b" -> false))
  }
}
