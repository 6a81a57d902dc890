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
}
