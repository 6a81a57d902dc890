package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group mode (most frequent value) with a DETERMINISTIC
 * tie-break (B85) — the categorical summary statistic (dominant ship
 * mode per brand, dominant device per user) that engines either lack
 * or leave tie-broken "by arbitrary row order" (DuckDB's mode(), any
 * first()-based fold): a result that changes across runs or partition
 * counts is unusable as a regression-tested pipeline output. Here ties
 * resolve to the SMALLEST value, so the answer is a pure function of
 * the data.
 *
 * Scale shape: the raw data is touched exactly once, by a
 * map-side-combined count over (keys, value) — the shuffle carries
 * distinct pairs, not rows. Everything after operates on that bounded
 * pair relation: a per-key max, a same-key join back (pair-sized on
 * both sides, co-partitioned by the key shuffle), and a min over the
 * tied winners. No windows, no sorts, no per-group state beyond the
 * distinct-value domain — the formulation survives a hot key with a
 * billion rows because that key contributes one pair per distinct
 * value, not a billion-row partition.
 */
object Mode {

  /** Output: keyCols ++ (mode_value, mode_count, n_distinct) — one row
   * per key; mode_value is the smallest among the maximally-frequent
   * values of valCol.
   */
  def groupedMode(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val counts = df
      .groupBy(keys :+ col(valCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val tops = counts
      .groupBy(keys: _*)
      .agg(max("__cnt").as("mode_count"),
        count(lit(1)).cast("long").as("n_distinct"))
    counts
      .join(tops, keyCols)
      .where(col("__cnt") === col("mode_count"))
      .groupBy(keys: _*)
      .agg(min(valCol).as("mode_value"),
        max("mode_count").as("mode_count"),
        max("n_distinct").as("n_distinct"))
      .select(keys ++ Seq(col("mode_value"), col("mode_count"), col("n_distinct")): _*)
  }
}
