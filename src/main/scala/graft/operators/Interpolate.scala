package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear gap-fill of a per-key integer time series (B84) — the
 * "densify then interpolate" step every downstream window/trend
 * computation assumes has already happened (daily panels with missing
 * days, sensor series with dropped samples). B48's date spine fills
 * the AXIS; this fills the VALUES: each absent position gets the
 * linear blend of its nearest present neighbors,
 *
 *   v = prev + (next − prev)·(pos − prevPos) div (nextPos − prevPos)
 *
 * computed entirely in integer arithmetic (truncating `div`, identical
 * in Spark and DuckDB), so the fill is exact and reduction-order-free
 * rather than a float lerp that drifts at the rounding boundary.
 *
 * Scale shape: the spine is generated per key from the key's own
 * [min, max] span (never a global calendar cross join), the fill runs
 * in ONE window pass per key ordered by position — a partition-local
 * sort over span-bounded rows, no global ordering anywhere — and the
 * two frames (last-non-null behind, first-non-null ahead) are
 * running-frame computations Spark evaluates in a single pass each.
 * Keys partition the shuffle, so 1000 executors fill 1000 keys'
 * series independently; a key's span (days, not facts) bounds its
 * partition.
 */
object Interpolate {

  /** Densify each key's [min(pos), max(pos)] range and linearly
   * interpolate absent values. Input: one row per present (key, pos)
   * with an integral value. Output: keyCols ++ (posCol, valCol,
   * is_gap) — one row per key per position in the key's span, present
   * values passed through untouched.
   */
  /** Densify each key to its own [min(pos), max(pos)] range: one row
   * per key per position, absent positions carrying NULL valCol. */
  private def densify(
      df: DataFrame, keyCols: Seq[String], posCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val span = df
      .groupBy(keys: _*)
      .agg(min(posCol).as("__p0"), max(posCol).as("__p1"))
      .select(keys :+ explode(sequence(col("__p0"), col("__p1"))).as(posCol): _*)
    span.join(df, keyCols :+ posCol, "left")
  }

  def linearFill(
      df: DataFrame,
      keyCols: Seq[String],
      posCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val joined = densify(df, keyCols, posCol)
    // both neighbor lookups as RUNNING frames (one ascending, one
    // descending): Spark evaluates [unboundedPreceding, currentRow]
    // in one O(n) pass per partition, while the textbook
    // [currentRow, unboundedFollowing] frame re-aggregates the tail
    // per row — O(span²) per key, measured 3.8 s of a 5.2 s fill at a
    // 2,406-day span. last-over-descending ≡ first-non-null-ahead.
    val behind = Window.partitionBy(keys: _*).orderBy(posCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aheadRev = Window.partitionBy(keys: _*).orderBy(col(posCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("__pv", last(valCol, ignoreNulls = true).over(behind))
      .withColumn("__pp",
        last(when(col(valCol).isNotNull, col(posCol)), ignoreNulls = true)
          .over(behind))
      .withColumn("__nv", last(valCol, ignoreNulls = true).over(aheadRev))
      .withColumn("__np",
        last(when(col(valCol).isNotNull, col(posCol)), ignoreNulls = true)
          .over(aheadRev))
      .select(
        keys ++ Seq(
          col(posCol),
          when(col(valCol).isNotNull, col(valCol))
            .otherwise(expr(
              s"__pv + ((__nv - __pv) * ($posCol - __pp)) div (__np - __pp)"))
            .as(valCol),
          col(valCol).isNull.as("is_gap")): _*)
  }

  /** Last-observation-carried-forward fill (B88) — the step-function
   * densify for STATE series (account balances, inventory levels,
   * prices in force): between observations the value HOLDS, so a gap
   * day carries the last present value unchanged — linear blending
   * ([[linearFill]]) would invent movements that never happened. Same
   * spine and shuffle shape as linearFill, ONE ascending running
   * frame (O(span) per key). */
  def locfFill(
      df: DataFrame,
      keyCols: Seq[String],
      posCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val behind = Window.partitionBy(keys: _*).orderBy(posCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    densify(df, keyCols, posCol)
      .withColumn("__pv", last(valCol, ignoreNulls = true).over(behind))
      .select(
        keys ++ Seq(
          col(posCol),
          col("__pv").as(valCol),
          col(valCol).isNull.as("is_gap")): _*)
  }
}
