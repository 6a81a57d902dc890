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
  def linearFill(
      df: DataFrame,
      keyCols: Seq[String],
      posCol: String,
      valCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val span = df
      .groupBy(keys: _*)
      .agg(min(posCol).as("__p0"), max(posCol).as("__p1"))
      .select(keys :+ explode(sequence(col("__p0"), col("__p1"))).as(posCol): _*)
    val joined = span.join(df, keyCols :+ posCol, "left")
    val w = Window.partitionBy(keys: _*).orderBy(posCol)
    val behind = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ahead = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("__pv", last(valCol, ignoreNulls = true).over(behind))
      .withColumn("__pp",
        last(when(col(valCol).isNotNull, col(posCol)), ignoreNulls = true)
          .over(behind))
      .withColumn("__nv", first(valCol, ignoreNulls = true).over(ahead))
      .withColumn("__np",
        first(when(col(valCol).isNotNull, col(posCol)), ignoreNulls = true)
          .over(ahead))
      .select(
        keys ++ Seq(
          col(posCol),
          when(col(valCol).isNotNull, col(valCol))
            .otherwise(expr(
              s"__pv + ((__nv - __pv) * ($posCol - __pp)) div (__np - __pp)"))
            .as(valCol),
          col(valCol).isNull.as("is_gap")): _*)
  }
}
