package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared token-span excision kernel: given documents and a per-document
 * set of covered token indices, rebuild each flagged document with the
 * covered tokens removed — the common tail of span-level
 * decontamination ([[Decontaminate.exciseContaminated]]) and
 * corpus-global duplicate-span removal ([[DupSpans]]).
 *
 * Scale shape: only FLAGGED documents (those with ≥1 covered token) pay
 * the token-level explode + ordered rebuild; the clean remainder of the
 * corpus streams through untouched with its ORIGINAL text. The rebuild
 * itself is one anti-join of the flagged docs' token stream against the
 * covered set plus one per-doc aggregation — both keyed by doc id, so
 * the work distributes by document and no driver state exists.
 */
object SpanExcision {

  /**
   * @param src     (__id, __text) — the full corpus
   * @param covered (__id, __tok) — DISTINCT covered token indices,
   *                0-based in the literal-whitespace token space of
   *                [[graft.functions.expressions.wordNgrams]] (the same
   *                kernel tokenizes here, so indices line up by
   *                construction)
   * @return (__id, clean_text, n_removed); a fully-covered document
   *         yields ("", token count)
   */
  def excise(src: DataFrame, covered: DataFrame): DataFrame = {
    import graft.functions.expressions.wordNgrams
    val dirtyIds = covered.select("__id").distinct()
    val dirty = src.join(dirtyIds, Seq("__id"), "left_semi")
    val toks = dirty.select(col("__id"), posexplode(wordNgrams(col("__text"), 1)))
      .withColumnRenamed("col", "__tokstr")
    val rebuilt = toks
      .join(covered,
        toks("__id") === covered("__id") && toks("pos") === covered("__tok"),
        "left_anti")
      .groupBy("__id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__tokstr")))),
          x => x.getField("__tokstr")), " ").as("__clean"),
        count(lit(1)).as("__kept"))
    val dirtyOut = dirty
      .withColumn("__ntok", size(wordNgrams(col("__text"), 1)).cast("long"))
      .join(rebuilt, Seq("__id"), "left") // missing = fully covered
      .select(col("__id"),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        (col("__ntok") - coalesce(col("__kept"), lit(0L))).as("n_removed"))
    val cleanOut = src.join(dirtyIds, Seq("__id"), "left_anti")
      .select(col("__id"), col("__text").as("clean_text"),
        lit(0L).as("n_removed"))
    dirtyOut.unionByName(cleanOut)
  }
}
