package graft.text

import graft.functions.expressions.wordChunks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Segment-level deduplication: remove from every document the segments
 * that occur in too many distinct documents, keeping the rest of the
 * document intact. This is the pretraining-corpus "line dedup" step
 * (boilerplate headers, navigation strings, license blocks repeat
 * across pages and leak into every model epoch) applied at a fixed
 * word-chunk granularity so it also works on corpora without line
 * structure. Documents themselves are never dropped — only the
 * repeated segments are cut.
 *
 * Scale shape (the production path never shuffles document text):
 *  1. one scan computes the codegen'd chunk array per doc and explodes
 *     to (doc_id, chunk_idx, chunk_hash) — the 64-bit xxhash64 stands
 *     in for the chunk string everywhere past the scan;
 *  2. duplicated-segment detection is ONE hash-aggregate shuffle of
 *     (chunk_hash, doc_id) pairs: count distinct docs per hash, keep
 *     hashes over the threshold — at 100 TB this is the same shape as
 *     exact dedup, just at segment granularity;
 *  3. chunks re-join the duplicated-hash set on the hash (ids-only
 *     shuffle) and survivors reassemble per doc with one more
 *     aggregate. Reassembly keeps original segment order via the
 *     chunk index.
 *
 * Hash-space ≡ string-space: collapsing segments by 64-bit hash can in
 * principle merge two distinct segments (2^-64 per pair); the oracle
 * for `q_segment_dedup` groups by the segment STRINGS in DuckDB, so
 * the hash-space result is verified identical to the string-space
 * definition on every run (same pattern as the C4b shingle check).
 */
object SegmentDedup {

  /** (doc_id, cidx, chunk) exploded segment table. */
  private[graft] def segments(docs: DataFrame, idCol: String, textCol: String,
                              chunkWords: Int): DataFrame =
    docs.select(col(idCol),
        posexplode(wordChunks(coalesce(col(textCol), lit("")), chunkWords))
          .as(Seq("cidx", "chunk")))

  /**
   * Per-document cleaned text after cutting segments that appear in
   * `>= minDocs` distinct documents. Returns every input document:
   * (idCol, clean_text, n_chunks, n_removed). A document whose
   * segments are all duplicated comes back with empty clean_text;
   * an empty/null document has n_chunks = 0.
   */
  def cleanChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkWords: Int = 8, minDocs: Int = 2): DataFrame = {
    val segs = segments(docs, idCol, textCol, chunkWords)
      .withColumn("ch", xxhash64(col("chunk")))
    // Duplicated-segment hash set: one (hash, doc) aggregate. The
    // count(distinct) rewrites to two hash-aggregates on the same key
    // — no extra shuffle beyond the expand.
    val dup = segs.groupBy(col("ch"))
      .agg(countDistinct(col(idCol)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("ch").as("dup_ch"))
    // Mark (left join on the hash) rather than anti-join so one pass
    // yields both the survivor text and the removal counters.
    val marked = segs.join(dup, segs("ch") === dup("dup_ch"), "left")
      .select(col(idCol), col("cidx"), col("chunk"),
        col("dup_ch").isNotNull.as("removed"))
    // collect_list skips nulls, so the conditional struct collects only
    // survivors; sort_array on (cidx, chunk) structs restores original
    // segment order without an interpreted comparator lambda.
    val perDoc = marked.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(
              when(!col("removed"), struct(col("cidx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"))
    // Zero-chunk (empty/null-text) documents fall out of the explode;
    // restore them from the input so the operator is total.
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
