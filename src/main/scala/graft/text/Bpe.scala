package graft.text

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE merge induction (C84) — the tokenizer-training core
 * of an LLM data pipeline: learn the top-N byte-pair merges from a
 * corpus, then segment the corpus with them (C85).
 *
 * Scale shape (the shape real BPE trainers use): the corpus collapses
 * ONCE to the (word, freq) vocabulary — a map-side-combined aggregate —
 * and every merge round runs on that VOCABULARY-sized relation, never
 * the corpus. Each round is: enumerate adjacent symbol pairs per
 * distinct word, weight by word frequency, pick the global best
 * (count desc, pair lexicographic — deterministic), and fold the
 * winner into the segmentation. The per-round driver state is ONE row.
 *
 * Rounds re-derive the segmentation from the ORIGINAL symbol string
 * with the merges-so-far applied as a chain of `replace` expressions
 * (r replaces in round r) instead of materializing iteration state:
 * no checkpoint/lineage growth, bit-deterministic, and exactly the
 * formulation a second engine replays (the oracle unrolls the same
 * rounds in DuckDB).
 *
 * Pair-count semantics are REPLACE-based (non-overlapping, scanning
 * left to right): count(word, "x y") = occurrences of " x y " in the
 * padded symbol string — identical in Spark and DuckDB, and identical
 * to how the merge itself applies. This differs from classic BPE's
 * overlap count only on runs of one symbol ("a a a" counts 1 here,
 * 2 classically) — documented, deterministic, and self-consistent:
 * the count ranks exactly what the merge can actually merge.
 *
 * ASCII-corpus precondition (C4b): symbols start as one CHARACTER per
 * codepoint on both engines; the engine-parity claim is pinned for
 * ASCII by the oracle.
 */
object Bpe {

  /** (word, freq) vocabulary of whitespace tokens — one corpus pass. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Padded symbol string of a word: " c h a r s " — single spaces
   * between symbols, one space of padding each side (so every pair
   * occurrence is the substring " x y ", unambiguous because no
   * symbol ever contains a space). trim defuses Java split's
   * trailing-empty on the zero-width end match. */
  def symInit(w: Column): Column =
    concat(lit(" "), trim(concat_ws(" ", split(w, ""))), lit(" "))

  /** The merges-so-far folded into a padded symbol string: round r
   * applies r chained replaces of " x y " → " xy ". */
  def applyMerges(sym: Column, merges: Seq[String]): Column =
    merges.foldLeft(sym) { (c, pair) =>
      val merged = pair.replace(" ", "")
      call_function("replace", c, lit(s" $pair "), lit(s" $merged "))
    }

  /** Weighted pair counts over the vocabulary with `merges` applied —
   * the shared per-round aggregate of [[learnMerges]] and
   * [[learnMergesBatched]]. Adjacent-pair enumeration runs on the
   * VOCABULARY (distinct words), so the interpreted higher-order
   * transform is off the corpus hot path; counts use the replace
   * formula (see object doc) so enumeration only names candidates. */
  private def pairCounts(vocab: DataFrame, merges: Seq[String]): DataFrame = {
    val sym = applyMerges(symInit(col("w")), merges)
    vocab.select(col("freq"), sym.as("sym"))
      .withColumn("syms", split(trim(col("sym")), " "))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), col("sym"),
        explode(expr(
          "array_distinct(transform(sequence(0, size(syms) - 2)," +
            " i -> concat(syms[i], ' ', syms[i + 1])))")).as("pair"))
      .withColumn("rem", call_function("replace", col("sym"),
        concat(lit(" "), col("pair"), lit(" ")), lit(" ")))
      // exact by construction: each occurrence removes len(pair)+1
      .withColumn("cnt", expr(
        "(length(sym) - length(rem)) div (length(pair) + 1)"))
      .groupBy("pair").agg(sum(col("cnt") * col("freq")).as("wcnt"))
  }

  /** Learn `nMerges` merges: Seq of (pair, merged, weightedCount),
   * in merge order. Each round: one vocabulary-sized aggregate + a
   * 1-row collect. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 1 && nMerges <= 64, s"nMerges in [1,64], got $nMerges")
    // the vocabulary is consumed by nMerges SEPARATE actions — the
    // legitimate persist case (r4 rule): one corpus scan total, every
    // round reads the bounded cached relation
    val vocab = wordFreqs(docs, textCol).persist()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 0 until nMerges) {
        val best = pairCounts(vocab, out.map(_._1).toSeq)
          .orderBy(col("wcnt").desc, col("pair"))
          .limit(1).collect()
        require(best.nonEmpty, s"bpe: vocabulary exhausted after ${out.size} merges")
        val pair = best(0).getString(0)
        out += ((pair, pair.replace(" ", ""), best(0).getLong(1)))
      }
      out.toSeq
    } finally { vocab.unpersist(): Unit }
  }

  /** One batched round's pick rule (C84b): candidates arrive ranked
   * (wcnt desc, pair lex); candidate i QUALIFIES iff its symbol pair
   * is disjoint from the symbols AND the merged form of EVERY
   * higher-ranked candidate in the window — checking against all
   * better-ranked candidates (not just selected ones) keeps the rule
   * one anti-join in SQL, no sequential selection state. The batch is
   * the first `kBatch` qualifiers in rank order. More conservative
   * than greedy (a pair blocked by a blocked pair waits a round), but
   * deterministic, engine-replayable, and symbol-disjoint WITHIN the
   * batch — and disjoint replaces commute: a selected pair's replace
   * cannot create (its merged form is excluded) or destroy (its
   * symbols are excluded; boundary spaces survive a replace) an
   * occurrence of any later selected pair, so every batched pair
   * merges exactly its counted occurrences. */
  private[graft] def selectBatch(cands: Seq[(String, Long)],
      kBatch: Int): Seq[(String, Long)] = {
    val parts = cands.map { case (p, c) =>
      val Array(a, b) = p.split(" ", 2)
      (p, c, a, b, a + b)
    }
    parts.zipWithIndex.filter { case ((_, _, a, b, _), i) =>
      parts.take(i).forall { case (_, _, ha, hb, hm) =>
        ha != a && ha != b && hb != a && hb != b && hm != a && hm != b
      }
    }.map { case ((p, c, _, _, _), _) => (p, c) }
      .take(kBatch)
  }

  /** Batched BPE merge induction (C84b, VERDICT r15 #4): real
   * tokenizer training learns 10⁴–10⁵ merges, so rounds must not
   * equal merges — each round picks the top `kBatch` PAIRWISE
   * SYMBOL-DISJOINT pairs (see [[selectBatch]]) from the top
   * `kBatch*4` candidate window and applies them as one chain, so
   * driver round-trips grow as merges/kBatch, not merges. Counts are
   * the PRE-ROUND counts each pick was ranked by — exact for every
   * pick because batch members are symbol-disjoint (replaces
   * commute). Returns (round, pick, pair, merged, weightedCount);
   * rounds may pick fewer than `kBatch` when the window thins —
   * data-dependent but deterministic, and the oracle replays the
   * same window/rule/cap round for round. */
  def learnMergesBatched(docs: DataFrame, textCol: String, rounds: Int,
      kBatch: Int): Seq[(Int, Int, String, String, Long)] = {
    require(rounds >= 1 && rounds <= 16, s"rounds in [1,16], got $rounds")
    require(kBatch >= 1 && kBatch <= 16, s"kBatch in [1,16], got $kBatch")
    val window = kBatch * 4
    val vocab = wordFreqs(docs, textCol).persist()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
      val merges = scala.collection.mutable.ArrayBuffer.empty[String]
      for (r <- 1 to rounds) {
        val cands = pairCounts(vocab, merges.toSeq)
          .orderBy(col("wcnt").desc, col("pair"))
          .limit(window).collect()
          .map(row => (row.getString(0), row.getLong(1))).toSeq
        val sel = selectBatch(cands, kBatch)
        require(sel.nonEmpty, s"bpe: vocabulary exhausted at round $r")
        sel.zipWithIndex.foreach { case ((p, c), i) =>
          out += ((r, i + 1, p, p.replace(" ", ""), c))
        }
        merges ++= sel.map(_._1)
      }
      out.toSeq
    } finally { vocab.unpersist(): Unit }
  }

  /** Segment the corpus with learned merges: per doc, symbols before
   * (characters of its words) and tokens after the merges — the
   * compression report that justifies a vocab budget. One corpus pass;
   * the merge chain is a per-row codegen'd replace chain. */
  def segmentReport(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame = {
    val words = docs.select(col(idCol),
      explode(TextFunctions.wsTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    words
      .select(col(idCol), length(col("w")).cast("long").as("n_sym"),
        (size(split(trim(applyMerges(symInit(col("w")), merges)), " ")))
          .cast("long").as("n_tok"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("symbols_before"),
        sum("n_tok").as("tokens_after"))
  }
}
