package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus n-gram statistics (vocabulary building / heavy-hitter terms
 * for a training-data pipeline).
 *
 * Scale design: tokens explode to one row per n-gram, but the count is
 * a hash aggregation with map-side partial combine, so the shuffle
 * carries one (ngram, partial-count) row per distinct n-gram per task
 * — the Zipf head (the rows that matter for top-k) collapses before it
 * moves. The final top-k is a TakeOrderedAndProject (per-partition
 * heap + driver merge of k rows), never a full sort of the vocabulary.
 *
 * Tokenization is an explicit `[ \t\n\r]+` split — byte-identical
 * across regex engines (no \s or \W class whose definition varies),
 * which is what makes the result exactly reproducible against other
 * systems.
 */
object Ngrams {

  /** One row per word n-gram occurrence: (ngram). The tokenize+gram
   * pass is a single codegen'd expression (graft.functions.HashOps
   * .wordNgrams) — the equivalent split→filter→transform→slice→
   * concat_ws composition is a tree of higher-order functions that
   * Spark always evaluates interpreted, ~5× slower end-to-end on the
   * corpus scan. */
  def ngrams(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    docs.select(explode(
      graft.functions.expressions.wordNgrams(col(textCol), n)).as("ngram"))
  }

  /** Top-k n-grams by exact count, ties broken by n-gram text.
   * Output: (ngram, cnt), descending. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    ngrams(docs, textCol, n)
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /** Per-source out-of-vocabulary statistics (C64) — vocabulary =
   * tokens whose GLOBAL occurrence count ≥ `minCount`; per source:
   * total/distinct token counts, OOV occurrences and types, and the
   * OOV rate in ppm. The signal a tokenizer/mixture decision needs:
   * a source whose token mass is dominated by corpus-rare types
   * (boilerplate ids, non-text noise, a language the vocab under-
   * covers) inflates sequence lengths and starves the shared vocab.
   *
   * Scale: the corpus scans ONCE — explode feeds a (source, token)
   * hash aggregation whose map-side combine collapses occurrences
   * before the shuffle (distinct pairs move, not token instances);
   * global totals then derive from THAT pair relation (token-keyed
   * re-aggregation — never a second corpus pass), the vocab flag is
   * a token-keyed join of two pair-sized relations, and the source
   * rollup is one more bounded exchange. AQE reuses the pair
   * relation's shuffle for both consumers. Nothing occurrence-sized
   * ever crosses the wire.
   */
  def oovStats(docs: DataFrame, sourceCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val pairs = docs
      .select(col(sourceCol).as("source"), explode(
        graft.functions.expressions.wordNgrams(
          coalesce(col(textCol), lit("")), 1)).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("tok").agg(sum("cnt").as("gcnt"))
    pairs.join(totals, "tok")
      .groupBy("source")
      .agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("gcnt") < minCount, col("cnt")).otherwise(0L))
          .as("oov_occurrences"),
        sum(when(col("gcnt") < minCount, 1L).otherwise(0L))
          .as("n_oov_types"))
      .withColumn("oov_ppm", expr("oov_occurrences * 1000000 div n_tokens"))
  }
}
