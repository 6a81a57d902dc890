package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered-sequence pattern matching (B97) — SQL MATCH_RECOGNIZE's
 * core, which Spark does not offer: per key, does the chronological
 * event-symbol sequence match a regex, and how many (non-overlapping)
 * times? "Sessions that viewed, then clicked, then purchased",
 * compliance orderings ("approve before pay"), error-then-retry
 * motifs. Symbols are caller-chosen single characters, so the full
 * regex language applies to event ORDER with arbitrary gaps.
 *
 * Plan: each key collapses to ONE symbol string via
 * sort_array(collect_list(struct(ord, symbol))) — a hash aggregation
 * with map-side partials, no window sort — and the regex runs where
 * the string lands. Per-key state is the key's event count (the
 * sessionize/segment bound: pattern matching is a per-SESSION
 * question; sessionize first if a key's full history is unbounded —
 * documented, same contract as B81's paths). Both engines scan
 * non-overlapping matches left-to-right, so `n_matches` replays
 * exactly for patterns without overlapping ambiguity.
 */
object Patterns {

  /**
   * One row per key: `seq` (the ordered symbol string), `seq_len`,
   * `matched` (regex found anywhere — Java `find()` semantics), and
   * `n_matches` (non-overlapping occurrences). `symbol` must be a
   * single-character string column; `ord` any orderable column.
   */
  def matchPattern(df: DataFrame, key: String, ord: String, symbol: String,
      pattern: String): DataFrame =
    df.groupBy(col(key))
      .agg(concat_ws("",
        transform(sort_array(collect_list(struct(col(ord), col(symbol)))),
          x => x.getField(symbol))).as("seq"))
      .withColumn("seq_len", length(col("seq")).cast("long"))
      .withColumn("matched", col("seq").rlike(pattern))
      .withColumn("n_matches", regexp_count(col("seq"), lit(pattern)).cast("long"))
}
