package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Trailing-window rolling distinct count: for every day, how many
 * distinct entities were active at least once in the last
 * `windowDays` days (the product-analytics WAU/MAU-by-day view).
 * COUNT(DISTINCT) OVER a RANGE frame is unsupported in Spark, and
 * the naive day×activity range join rescans the fact table once per
 * day — the 100 TB killer.
 *
 * Scale design: raw activity first collapses to distinct
 * (entity, day) pairs — map-side partial dedup, output bounded by
 * |entities| × |days|, not row count. Each pair then fans out to the
 * `windowDays` cover days it vouches for (a bounded ×w explode, the
 * standard trade of replication for join elimination), dedups again
 * on (entity, cover day) — one entity active twice in a window must
 * count once — and a final per-day count. Three exchanges total,
 * every one on a key, none data-squared; w stays a small constant
 * (7, 28) while the fact table grows.
 */
object Rolling {

  /**
   * One row per day with at least one entity active in its trailing
   * window: (`day`, `n_distinct`). `day` must be an integer day
   * index (epoch days); cover days past the data's max day are
   * clipped (no extrapolated trailing ghosts).
   */
  def rollingDistinct(
      df: DataFrame,
      entity: String,
      day: String,
      windowDays: Int): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val pairs = df
      .select(col(entity).as("e"), col(day).cast("long").as("d"))
      .distinct()
    val hi = pairs.agg(max("d").as("hi"))
    pairs
      .select(col("e"),
        explode(sequence(col("d"), col("d") + lit(windowDays - 1).cast("long")))
          .as("day"))
      .distinct()
      .crossJoin(broadcast(hi))
      .filter(col("day") <= col("hi"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_distinct"))
  }
}
