package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-global duplicate-span removal: excise every NON-CANONICAL
 * occurrence of any word n-gram that appears at least `minCount` times
 * across the whole corpus, keeping exactly one copy (the occurrence
 * with the lowest (doc id, token position)) — the exact-substring
 * flavor of training-data dedup (Lee et al. 2022, "Deduplicating
 * Training Data Makes Language Models Better"), where boilerplate
 * repeated across documents is cut at span granularity instead of
 * dropping whole near-duplicate documents (the C2–C5 family).
 *
 * Scale shape (100 TB):
 *  - gram occurrences come from one corpus scan through the codegen'd
 *    [[graft.functions.expressions.wordNgrams]] kernel, compared by
 *    64-bit hash (shuffle volume; differs from string equality only on
 *    a ~n²/2⁶⁴ collision);
 *  - per-gram stats (total count + canonical first occurrence) are ONE
 *    hash aggregation with map-side partial combine — heavy boilerplate
 *    grams collapse to one row per partition before the shuffle, so a
 *    gram repeated 10⁹ times costs its occurrence rows only locally;
 *  - the occurrence←stats join ships only grams that crossed the
 *    `minCount` bar (Zipf: a thin head), and AQE's skew split handles
 *    the reducer that owns a mega-gram's occurrence list;
 *  - only flagged documents pay the token-level rebuild
 *    ([[SpanExcision.excise]]); a boilerplate-free corpus streams
 *    through untouched.
 */
object DupSpans {

  /**
   * Output: (idCol, clean_text, n_removed) for EVERY input document —
   * untouched docs keep their original text byte-for-byte, flagged docs
   * are rebuilt from their kept tokens (single-space joined), a
   * fully-duplicate document yields ("", token count).
   *
   * A token is excised iff some hot-gram occurrence covering it is
   * non-canonical; tokens inside a canonical occurrence survive unless
   * an OVERLAPPING non-canonical occurrence of a different gram kills
   * them. Documents with fewer than n tokens emit no grams and are
   * never flagged.
   */
  def exciseDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Long): DataFrame = {
    import graft.functions.expressions.wordNgrams
    val src = docs.select(col(idCol).as("__id"), col(textCol).as("__text"))
    val occ = src
      .select(col("__id"), posexplode(wordNgrams(col("__text"), n)))
      .select(col("__id"), col("pos"), xxhash64(col("col")).as("__gh"))
    // min(struct) = lexicographic (doc id, pos): the canonical copy.
    val hot = occ.groupBy("__gh")
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("__id"), col("pos"))).as("__first"))
      .filter(col("__cnt") >= minCount)
      .select(col("__gh"), col("__first"))
    val covered = occ.join(hot, Seq("__gh"))
      .filter(!(col("__id") === col("__first.__id") &&
        col("pos") === col("__first.pos")))
      .select(col("__id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("__tok"))
      .distinct()
    SpanExcision.excise(src, covered).withColumnRenamed("__id", idCol)
  }
}
