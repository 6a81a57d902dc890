package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed skyline / Pareto frontier (B124) — "which offers are not
 * beaten on BOTH price and quality": the multi-objective shortlist
 * behind procurement views, instance-type pickers, and candidate
 * pruning. A row p is DOMINATED when some row q in its group has
 * x_q <= x_p and y_q >= y_p with at least one strict (x minimized, y
 * maximized); the frontier is the non-dominated set. Naive evaluation
 * is the all-pairs NOT EXISTS (the oracle's formulation — O(n²), fine
 * for a second engine at oracle SF, fatal at 100 TB).
 *
 * Scale shape: the classic sort-free bucket decomposition —
 *  1. per-group x bounds (one tiny agg, broadcast back);
 *  2. fixed-width x-buckets; per-(group, bucket) max y (map-side
 *     combined);
 *  3. the running prefix "best y in any STRICTLY LOWER bucket" over
 *     the tiny (groups × buckets) relation — broadcast back;
 *  4. the exact dominance test entirely inside PARTITIONED windows:
 *     max y over same-bucket rows with strictly smaller x (integer
 *     RANGE frame to -1), combined with the cross-bucket prefix, plus
 *     max y among equal-x rows for the strict tie rule.
 * No global sort, no unpartitioned window, no self-join: the only
 * corpus-sized shuffles are the per-bucket aggregation and the two
 * partitioned windows; everything cross-bucket moves through a
 * groups × buckets relation that is broadcast-sized by construction.
 */
object Skyline {

  /** Frontier of `df` per `groupCols`: `xCol` (integral, lower is
   * better) vs `yCol` (integral, higher is better). Returns the input
   * rows restricted to the frontier. Duplicated (x, y) points are all
   * kept (neither strictly beats the other — the NOT EXISTS
   * semantics). `buckets` bounds the cross-bucket relation at
   * groups × buckets rows. Coordinates must be non-null integral:
   * NULL-x/NULL-y rows are FILTERED before bucketing (a NULL
   * coordinate can neither dominate nor be dominated
   * deterministically — and an unfiltered NULL-x row would form a
   * NULL bucket that sorts first in the cross-bucket prefix window,
   * poisoning `_pref_y` for every real bucket and evicting genuine
   * frontier rows); impute upstream if such rows must participate. */
  def frontier(df0: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"skyline: buckets must be >= 1, got $buckets")
    require(groupCols.nonEmpty, "skyline: need at least one group column")
    val df = df0.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val g = groupCols.map(col)
    val bounds = df.groupBy(g: _*)
      .agg(min(col(xCol)).as("_x_min"), max(col(xCol)).as("_x_max"))
    // fixed-width integer buckets; width >= 1 guards the constant-x
    // group. Bucket assignment only has to be DETERMINISTIC and
    // MONOTONE in x (double division then truncation is both) — the
    // dominance test below unions "strictly lower buckets" with
    // "same bucket, strictly smaller x", which covers exactly
    // {x' < x} wherever the boundaries fall. The span and offset
    // subtract in DOUBLE space (ADVICE r16): a group whose x range
    // exceeds Long.MaxValue (min near Long.MinValue) would wrap the
    // Long subtraction negative, collapsing the width to 1 with
    // overflowing bucket ids and a broken monotone order; the double
    // path loses only low-bit precision, which monotone truncation
    // tolerates (boundaries may shift, coverage cannot).
    val withB = df.join(broadcast(bounds), groupCols)
      .withColumn("_w",
        greatest(lit(1L),
          ((col("_x_max").cast("double") - col("_x_min").cast("double"))
            / lit(buckets.toDouble)).cast("long") + 1L))
      .withColumn("_b",
        ((col(xCol).cast("double") - col("_x_min").cast("double")) / col("_w"))
          .cast("long"))
    val bucketMax = withB.groupBy((g :+ col("_b")): _*)
      .agg(max(col(yCol)).as("_by"))
    val pref = Window.partitionBy(g: _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefMax = bucketMax
      .withColumn("_pref_y", max(col("_by")).over(pref))
      .select((g :+ col("_b") :+ col("_pref_y")): _*)
    val inBucketBelow = Window.partitionBy((g :+ col("_b")): _*)
      .orderBy(col(xCol).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy((g :+ col(xCol)): _*)
    withB.join(broadcast(prefMax), groupCols :+ "_b", "left")
      .withColumn("_y_lt",
        greatest(
          coalesce(max(col(yCol)).over(inBucketBelow), lit(Long.MinValue)),
          coalesce(col("_pref_y"), lit(Long.MinValue))))
      .withColumn("_y_eq", max(col(yCol)).over(sameX))
      // dominated iff a strictly-cheaper row ties-or-beats y, or an
      // equal-x row strictly beats y
      .filter(col(yCol) > col("_y_lt") && col(yCol) >= col("_y_eq"))
      .drop("_x_min", "_x_max", "_w", "_b", "_pref_y", "_y_lt", "_y_eq")
  }
}
