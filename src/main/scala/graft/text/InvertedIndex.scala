package graft.text

import graft.functions.expressions.wordNgrams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Inverted index over a document corpus: term → document-frequency +
 * sorted posting list. The lookup-side primitive behind corpus search,
 * decontamination-by-term, and per-term slicing of a 100 TB corpus
 * without re-scanning text.
 *
 * Scale shape:
 *  - build is one scan (codegen'd tokenizer, per-doc `array_distinct`
 *    BEFORE the explode so a term repeated inside a document costs one
 *    exploded row, not tf rows) plus one hash-aggregate shuffle keyed
 *    by term;
 *  - posting lists are per-term arrays — bounded by document frequency,
 *    not corpus size; the heavy-hitter stopword terms are exactly the
 *    ones a caller prunes with the df bounds, and `build` exposes
 *    `max_df` capping for that reason;
 *  - `write` persists the index bucketed by term so a term-lookup join
 *    against it is exchange-free on the index side, and min/max stats
 *    per file give data skipping on the term column.
 */
object InvertedIndex {

  /**
   * (term, df, postings) with postings sorted ascending. `minDf` and
   * `maxDf` prune rare-typo terms and stopword heavy hitters at build
   * time (0 = no bound).
   */
  def build(docs: DataFrame, idCol: String, textCol: String,
            minDf: Long = 0L, maxDf: Long = 0L): DataFrame = {
    val terms = docs.select(col(idCol).as("doc"),
        explode(array_distinct(wordNgrams(coalesce(col(textCol), lit("")), 1))).as("term"))
    val idx = terms.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col("doc"))).as("postings"))
    val lo = if (minDf > 0) idx.filter(col("df") >= minDf) else idx
    if (maxDf > 0) lo.filter(col("df") <= maxDf) else lo
  }

  /** Persist bucketed+sorted by term: recurring term lookups join
   * exchange-free against the index side. */
  def write(index: DataFrame, table: String, buckets: Int = 32): Unit =
    index.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .option("path", s"target/inverted_index/$table")
      .format("parquet").saveAsTable(table)

  /** Doc ids containing ALL query terms (conjunctive lookup): semi
   * joins per term then intersects via df-count — the index side only
   * ever ships the handful of matching posting rows. */
  def lookupAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    val hits = index
      .filter(col("term").isin(terms: _*))
      .select(explode(col("postings")).as("doc"))
    hits.groupBy(col("doc")).agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.distinct.length)
      .select(col("doc"))
  }
}
