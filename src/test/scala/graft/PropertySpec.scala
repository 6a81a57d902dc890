package graft

import graft.functions.HashOps
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the hash kernels over seeded random
  * inputs (pure JVM functions; the distributed paths are covered by
  * the operator specs). */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xC0FFEE)
  private val vocab = Vector("spark", "scan", "join", "agg", "table", "row",
    "batch", "stream", "merge", "filter", "the", "a", "fast", "slow", "key")

  private def randText(): String =
    Seq.fill(rnd.nextInt(60) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def arr(xs: Array[Long]) = new GenericArrayData(xs)
  private def sh(t: String) = HashOps.wordShingleHashes(UTF8String.fromString(t), 3)

  test("hashJaccard is bounded, symmetric, 1.0 on self") {
    for (_ <- 1 to 200) {
      val (a, b) = (randText(), randText())
      val (ha, hb) = (sh(a), sh(b))
      val jab = HashOps.hashJaccard(arr(ha), arr(hb))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab == HashOps.hashJaccard(arr(hb), arr(ha)))
      // self-similarity is 1.0 for any doc WITH shingles; a
      // shingle-less doc (< 3 tokens) is in no dup relation, even
      // with itself (the degenerate-doc contract, round 13)
      assert(HashOps.hashJaccard(arr(ha), arr(ha)) == (if (ha.nonEmpty) 1.0 else 0.0))
    }
  }

  test("wordShingleHashes is sorted, distinct, case-insensitive") {
    for (_ <- 1 to 200) {
      val t = randText()
      val h = sh(t)
      assert(h.toSeq == h.toSeq.sorted && h.toSeq == h.toSeq.distinct)
      assert(sh(t.toUpperCase).toSeq == h.toSeq)
      // punctuation between words is a token boundary, like \W+
      assert(sh(t.replace(" ", ", ")).toSeq == h.toSeq)
    }
  }

  test("wordChunks: rejoining chunks reproduces the token stream; count is ceil(m/k)") {
    for (_ <- 1 to 200) {
      val t = randText()
      val toks = t.split(" ").filter(_.nonEmpty)
      val k = rnd.nextInt(8) + 1
      val chunks = HashOps.wordChunks(UTF8String.fromString(t), k).map(_.toString)
      assert(chunks.length == (toks.length + k - 1) / k)
      assert(chunks.mkString(" ") == toks.mkString(" "))
      chunks.dropRight(1).foreach(c => assert(c.split(" ").length == k))
      // messy whitespace normalizes to the same chunks
      val messy = "  " + t.replace(" ", " \t ") + "\n"
      assert(HashOps.wordChunks(UTF8String.fromString(messy), k).map(_.toString).toSeq
        == chunks.toSeq)
    }
  }

  test("hashContainment: bounded, 1.0 on self and subsets, lower-bounded by jaccard") {
    for (_ <- 1 to 200) {
      val (a, b) = (randText(), randText())
      val (ha, hb) = (sh(a), sh(b))
      val c = HashOps.hashContainment(arr(ha), arr(hb))
      assert(c >= 0.0 && c <= 1.0)
      // empty A is NOT vacuously contained (degenerate-doc contract)
      assert(HashOps.hashContainment(arr(ha), arr(ha)) == (if (ha.nonEmpty) 1.0 else 0.0))
      // |A∩B|/|A| ≥ |A∩B|/|A∪B| always — containment can only exceed
      // jaccard (the property that makes it catch near-subsets)
      assert(c >= HashOps.hashJaccard(arr(ha), arr(hb)) - 1e-12)
      // a genuine subset (intersection of the two sets) is fully
      // contained in both originals
      val inter = ha.toSet.intersect(hb.toSet).toArray.sorted
      if (inter.nonEmpty) {
        assert(HashOps.hashContainment(arr(inter), arr(ha)) == 1.0)
        assert(HashOps.hashContainment(arr(inter), arr(hb)) == 1.0)
      }
    }
  }

  test("wordChunksStrided: every chunk bounded by window, token stream at stride offsets") {
    for (_ <- 1 to 200) {
      val t = randText()
      val toks = t.split(" ").filter(_.nonEmpty)
      val st = rnd.nextInt(6) + 1
      val w = st + rnd.nextInt(6)
      val chunks = HashOps.wordChunksStrided(UTF8String.fromString(t), w, st).map(_.toString)
      assert(chunks.length == (toks.length + st - 1) / st)
      chunks.zipWithIndex.foreach { case (c, i) =>
        val expect = toks.slice(i * st, math.min(i * st + w, toks.length))
        assert(c.split(" ").toSeq == expect.toSeq, s"chunk $i mismatch")
      }
      // stride == window degenerates exactly to the disjoint chunker
      assert(HashOps.wordChunksStrided(UTF8String.fromString(t), st, st).map(_.toString).toSeq
        == HashOps.wordChunks(UTF8String.fromString(t), st).map(_.toString).toSeq)
    }
  }

  test("minhashSig is fixed-width and deterministic") {
    for (_ <- 1 to 100) {
      val h = sh(randText())
      val sig = HashOps.minhashSig(arr(h), 64)
      assert(sig.length == 64)
      assert(HashOps.minhashSig(arr(h), 64).toSeq == sig.toSeq)
    }
  }

  test("minhash signature agreement tracks jaccard similarity") {
    // near-identical texts agree on most permutation slots; unrelated
    // texts (disjoint vocab) agree on almost none
    val base = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val near = base.split(" ").updated(5, "changed").mkString(" ")
    val far = Seq.fill(60)("zz" + rnd.nextInt(1000)).mkString(" ")
    def agree(a: String, b: String): Double = {
      val (sa, sb) = (HashOps.minhashSig(arr(sh(a)), 64), HashOps.minhashSig(arr(sh(b)), 64))
      sa.zip(sb).count { case (x, y) => x == y } / 64.0
    }
    assert(agree(base, near) > 0.5)
    assert(agree(base, far) < 0.1)
  }

  test("simhash: identical tokens → identical hash; disjoint vocab → far") {
    def tok(s: String) = new GenericArrayData(
      s.split(" ").filter(_.nonEmpty).map(UTF8String.fromString(_): Any))
    val t = randText()
    assert(HashOps.simhash64(tok(t)) == HashOps.simhash64(tok(t)))
    val far = Seq.fill(40)("qq" + rnd.nextInt(1000)).mkString(" ")
    assert(java.lang.Long.bitCount(
      HashOps.simhash64(tok(t)) ^ HashOps.simhash64(tok(far))) > 8)
  }

  test("cosine is 1 on self, bounded, symmetric") {
    def vec() = Array.fill(16)(rnd.nextGaussian())
    for (_ <- 1 to 200) {
      val (a, b) = (vec(), vec())
      def ad(x: Array[Double]) = new GenericArrayData(x)
      val c = HashOps.cosine(ad(a), ad(b), isFloat = false)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(c == HashOps.cosine(ad(b), ad(a), isFloat = false))
      assert(math.abs(HashOps.cosine(ad(a), ad(a), isFloat = false) - 1.0) < 1e-9)
    }
  }

  test("winnow fingerprints overlap under a prefix edit") {
    for (_ <- 1 to 100) {
      val t = randText()
      if (t.length > 40) {
        val w1 = HashOps.winnow(UTF8String.fromString(t), 8, 16).toSet
        val w2 = HashOps.winnow(UTF8String.fromString("PREFIX-" + t), 8, 16).toSet
        assert((w1 intersect w2).nonEmpty)
      }
    }
  }

  test("winnow sample size stays within the q_fingerprint oracle bound") {
    // the q_fingerprint invariant: 1 <= |winnow(k=8,w=16)| <= max(1, B-22)
    // where B is the BYTE length (== char length on the ASCII corpus;
    // the oracle's chars-based bound is valid only because of that)
    for (len <- Seq(0, 1, 7, 8, 23, 24, 25, 100) ++ (1 to 50).map(_ => rnd.nextInt(300))) {
      val t = randText().padTo(len, 'x').take(len)
      val b = t.getBytes("UTF-8").length
      val n = HashOps.winnow(UTF8String.fromString(t), 8, 16).length
      assert(n >= 1 && n <= math.max(1, b - 22),
        s"len=$len bytes=$b winnow=$n")
    }
  }

  test("searchSorted equals the linear count of breaks <= v (random sorted breaks)") {
    for (_ <- 1 to 500) {
      val breaks = Array.fill(rnd.nextInt(40) + 1)(rnd.nextLong() % 1000L).sorted
      val v = rnd.nextLong() % 1200L
      val got = HashOps.searchSorted(breaks, v)
      assert(got == breaks.count(_ <= v), s"breaks=${breaks.toSeq} v=$v got=$got")
      assert(got >= 0 && got <= breaks.length)
    }
  }

  test("cycleStats equals the brute-force census on random functional graphs") {
    val spark = TestSpark.spark
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(160)
      val f = Array.fill(n)(rnd.nextInt(n).toLong)
      // brute force: a node is on a cycle iff walking n steps returns
      // to it at some point with period dividing the walk; simplest —
      // iterate n steps to land on the terminal cycle, then walk that
      // cycle collecting members
      val onCycle = scala.collection.mutable.Map.empty[Long, Long] // node -> cycle min
      for (start <- 0 until n) {
        var v = start.toLong
        for (_ <- 0 until n) v = f(v.toInt)
        // v is on a cycle now; walk it
        val members = scala.collection.mutable.ArrayBuffer(v)
        var w = f(v.toInt)
        while (w != v) { members += w; w = f(w.toInt) }
        val mn = members.min
        members.foreach(m => onCycle(m) = mn)
      }
      val want = onCycle.groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val nxt = (0 until n).map(i => (i.toLong, f(i))).toDF("id", "n")
      val got = graft.operators.Graph.cycleStats(nxt, "id", "n")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed n=$n got=$got want=$want")
    }
  }

  test("gopherTopNgramPpm agrees with a naive recount on random word salads (C89)") {
    for (_ <- 1 to 200) {
      val t = randText()
      val got = HashOps.gopherTopNgramPpm(UTF8String.fromString(t), 2, 4).toSeq
      val toks = t.split("[ \t\n\r]+").filter(_.nonEmpty).toSeq
      val want = (2 to 4).map { n =>
        if (toks.length < n || t.isEmpty) 0L
        else {
          val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
          val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
          val best = counts.toSeq.minBy { case (g, c) => (-c, g) }
          best._2.toLong * best._1.length * 1000000L / t.length
        }
      }
      assert(got == want, s"text='$t' got=$got want=$want")
    }
  }

  test("hashedLinearScore is additive over concatenation and case-blind (C90)") {
    def score(t: String) = HashOps.hashedLinearScore(
      UTF8String.fromString(t), 65536L, 1442695040888963407L)
    for (_ <- 1 to 200) {
      val (a, b) = (randText(), randText())
      // per-occurrence sum => concatenation with a separator is additive
      assert(score(a + " " + b) == score(a) + score(b))
      assert(score(a.toUpperCase) == score(a))
      // separators carry no weight
      assert(score("  ,. " + a + " ;;") == score(a))
    }
  }

  test("luhnValid: appending the computed check digit always validates (C88)") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    def luhnSumNaive(d: String): Int = d.reverse.zipWithIndex.map { case (ch, i) =>
      val v = ch - '0'
      if (i % 2 == 1) { val dd = v * 2; if (dd > 9) dd - 9 else dd } else v
    }.sum
    val bodies = (1 to 100).map(_ => Seq.fill(14)(rnd.nextInt(10)).mkString)
    val withCheck = bodies.map { b =>
      // check digit c makes luhnSum(b + c) % 10 == 0; c sits at rightmost
      // (undoubled) position, so c = (10 - luhnSum(b + "0") % 10) % 10
      val c = (10 - luhnSumNaive(b + "0") % 10) % 10
      b + c.toString
    }
    val got = withCheck.toDF("d")
      .select(graft.text.Pii.luhnValid(col("d"))).as[Boolean].collect()
    assert(got.forall(identity))
    // and bumping the check digit by one always invalidates
    val bumped = withCheck.map(s => s.init + ((s.last - '0' + 1) % 10).toString)
    val bad = bumped.toDF("d")
      .select(graft.text.Pii.luhnValid(col("d"))).as[Boolean].collect()
    assert(bad.forall(!_))
  }
}
