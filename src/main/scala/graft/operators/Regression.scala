package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact per-group simple linear regression (OLS y = a + b·x) from
 * integer sufficient statistics.
 *
 * The textbook per-group fit either collects each group to the driver
 * or runs REGR_SLOPE-style floating-point aggregates, whose incremental
 * covariance accumulates in reduction order — a 1000-executor sum is
 * not reproducible at the ulp, and two runs of the same job can
 * disagree in the last digits. Here x and y are integers (epoch days,
 * cents), so the five sufficient statistics (n, Σx, Σy, Σxx, Σxy) are
 * EXACT decimal(38,0) sums — one map-side-combined aggregation,
 * reduction-order-free — and the closed forms
 *
 *   slope     = num / den,  num = n·Σxy − Σx·Σy,  den = n·Σxx − (Σx)²
 *   intercept = (Σy·den − num·Σx) / (n·den)          (= ȳ − slope·x̄)
 *
 * are emitted as exact scaled integral quotients (`div`, which
 * truncates toward zero identically in Spark and DuckDB). A group
 * whose x never varies has den = 0 → NULL slope/intercept
 * (integral-divide-by-zero is NULL in both engines), never a crash.
 *
 * Scale: the only shuffle carries ≤ |groups| rows of five numbers
 * (partials combine map-side); decimal(38,0) holds n·Σxy for ~1e9-row
 * groups of |x| ≤ 1e5, |y| ≤ 1e9 with ten digits of headroom, and an
 * overflow beyond that surfaces as NULL/error rather than a silently
 * wrapped long (the B55 lesson: never pack exactness into int64 at
 * the scale boundary).
 */
object Regression {

  /** Per-group OLS fit. Output: groupCols ++ (n, slope_scaled,
   * intercept) where slope_scaled = slope · slopeScale truncated to a
   * long (e.g. scale 1e6 → micro-units of y per unit of x) and
   * intercept is in y's own units. x and y must be integral columns.
   */
  def groupedOls(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      slopeScale: Long = 1000000L): DataFrame = {
    val d38 = DecimalType(38, 0)
    val xd = col(xCol).cast(d38)
    val yd = col(yCol).cast(d38)
    val agg = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).as("sx"),
        sum(yd).as("sy"),
        sum((xd * xd).cast(d38)).as("sxx"),
        sum((xd * yd).cast(d38)).as("sxy"))
      .withColumn("num",
        col("n").cast(d38) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den",
        col("n").cast(d38) * col("sxx") - col("sx") * col("sx"))
    // nullif: a constant-x group (den = 0) yields NULL, not an ANSI
    // divide-by-zero failure
    agg.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        expr(s"(num * cast($slopeScale as decimal(38,0))) div nullif(den, 0)")
          .as("slope_scaled"),
        expr("(sy * den - num * sx) div nullif(n * den, 0)").as("intercept")): _*)
  }
}
