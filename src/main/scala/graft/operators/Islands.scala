package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gaps-and-islands: group each key's integer sequence positions into
 * maximal runs of CONSECUTIVE values (the classic streak / coverage
 * question — "how long did activity stay unbroken, and where are the
 * gaps?"). SQL's standard trick: after dedup, `pos - row_number()`
 * is constant within a consecutive run and strictly increasing
 * across gaps, so it is a per-run group id computable with ONE
 * window pass — no self-join, no recursion.
 *
 * Scale design: one shuffle on `key`, then a within-key sort for the
 * row_number window. Per-key group sizes are bounded by the size of
 * the position DOMAIN (months in a decade, days in a year), not by
 * the row count — the dedup ahead of the window collapses any number
 * of raw rows to at most |domain| per key, with partial (map-side)
 * aggregation doing the collapse before the exchange. The follow-up
 * per-island and per-key rollups reuse the same key partitioning, so
 * the whole pipeline is a single exchange.
 */
object Islands {

  /**
   * One row per (key, island): `island_start`, `island_end`
   * (inclusive positions) and `island_len`. `df` must carry integer
   * columns `key` and `pos`; duplicates are collapsed.
   */
  def islands(df: DataFrame, key: String, pos: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(pos)
    df.select(col(key), col(pos).cast("long").as(pos)).distinct()
      .withColumn("__grp", col(pos) - row_number().over(w))
      .groupBy(col(key), col("__grp"))
      .agg(
        min(pos).as("island_start"),
        max(pos).as("island_end"),
        count(lit(1)).as("island_len"))
      .drop("__grp")
  }

  /**
   * Per-key streak summary over the islands: island count, total
   * covered positions, longest run, and first/last covered position.
   */
  def streakStats(df: DataFrame, key: String, pos: String): DataFrame =
    islands(df, key, pos)
      .groupBy(key)
      .agg(
        count(lit(1)).as("n_islands"),
        sum("island_len").as("n_active"),
        max("island_len").as("longest_streak"),
        min("island_start").as("first_pos"),
        max("island_end").as("last_pos"))
}
