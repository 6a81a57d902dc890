package graft.text

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocklist term-hit audit (C68) — the safety / policy filtering pass
 * every corpus release runs: score each document against a curated
 * term list (severity-weighted), flag the documents whose weighted
 * hit mass crosses a threshold.
 *
 * The naive implementation scans the corpus once PER TERM (|terms|
 * regex passes, or one giant alternation that falls out of codegen
 * and out of RE2-class guarantees). Here the corpus is tokenized
 * ONCE (codegen'd split), the term list joins as a BROADCAST
 * dimension against the exploded tokens — an equi-join, so the
 * map-side hash probe discards every non-matching token before any
 * shuffle: the aggregation exchange carries only the HITS (corpus
 * blocklist hit rates are a few per mille), never the token stream.
 * A thousand-term list costs the same single scan as three terms.
 *
 * Degenerate inputs surface rather than vanish: documents with no
 * hits are retained by the left join with zero counts (the audit
 * must say "clean", not drop the row).
 */
object Blocklist {

  /**
   * `terms` must carry (`term`, `severity`) — lowercase single-word
   * terms, severity a positive integer weight. Output: one row per
   * input document — distinct terms hit, total hits, severity-
   * weighted hits, max severity seen, and `flagged` (weighted ≥
   * threshold). All-integer, replayable.
   */
  def termHits(docs: DataFrame, docId: String, text: String,
      terms: DataFrame, flagThreshold: Long): DataFrame = {
    val toks = docs.select(col(docId),
      explode(TextFunctions.words(col(text))).as("_w"))
    val hits = toks
      .join(broadcast(terms), col("_w") === col("term"))
      .groupBy(col(docId))
      .agg(
        countDistinct(col("term")).as("n_flag_terms"),
        count(lit(1)).as("n_flag_hits"),
        sum(col("severity")).as("weighted_hits"),
        max(col("severity")).as("max_severity"))
    docs.select(col(docId)).join(hits, Seq(docId), "left")
      .select(col(docId),
        coalesce(col("n_flag_terms"), lit(0L)).as("n_flag_terms"),
        coalesce(col("n_flag_hits"), lit(0L)).as("n_flag_hits"),
        coalesce(col("weighted_hits"), lit(0L)).as("weighted_hits"),
        coalesce(col("max_severity"), lit(0L)).as("max_severity"))
      .withColumn("flagged", col("weighted_hits") >= flagThreshold)
  }
}
