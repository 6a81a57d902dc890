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
        val sym = applyMerges(symInit(col("w")), out.map(_._1).toSeq)
        // adjacent-pair enumeration runs on the VOCABULARY (distinct
        // words), so the interpreted higher-order transform is off the
        // corpus hot path; counts use the replace formula (see object
        // doc) so enumeration only names candidates
        val best = vocab.select(col("freq"), sym.as("sym"))
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
          .orderBy(col("wcnt").desc, col("pair"))
          .limit(1).collect()
        require(best.nonEmpty, s"bpe: vocabulary exhausted after ${out.size} merges")
        val pair = best(0).getString(0)
        out += ((pair, pair.replace(" ", ""), best(0).getLong(1)))
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
