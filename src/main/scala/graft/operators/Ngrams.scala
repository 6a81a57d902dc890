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

  /** One row per word n-gram occurrence: (ngram). */
  def ngrams(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    docs
      .withColumn("__toks",
        expr(s"filter(split(`$textCol`, '[ \\t\\n\\r]+'), t -> t <> '')"))
      // guard: sequence(1, x) is DESCENDING for x < 1, which would
      // fabricate out-of-range slices for texts shorter than n words
      .withColumn("__grams",
        when(size(col("__toks")) >= n,
          expr(s"transform(sequence(1, size(__toks) - ${n - 1}), " +
               s"i -> concat_ws(' ', slice(__toks, i, $n)))"))
          .otherwise(expr("array()").cast("array<string>")))
      .select(explode(col("__grams")).as("ngram"))
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
