package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed sweep line: peak concurrency (max number of
 * simultaneously open intervals) per time bucket. The textbook
 * algorithm — sort all +1/-1 endpoint deltas and take the max of the
 * running sum — is inherently sequential; a naive Spark translation
 * is a GLOBAL single-partition window over every endpoint, which is
 * exactly the operator that dies first at 100 TB.
 *
 * Scale design (two-level segmented prefix sum): endpoints are
 * bucketed by `bucketUs`; the running sum is computed per bucket
 * (shuffle + sort partitioned BY BUCKET — parallel, data-sized), and
 * each bucket's carry-in level is the cumulative sum of prior
 * buckets' delta TOTALS — a second window over one row per bucket,
 * whose size is bounded by the time span divided by the bucket
 * width (the calendar, not the data). Peak in a bucket = carry-in +
 * max within-bucket running sum. The only sequential structure left
 * is over the bounded bucket domain.
 *
 * Determinism: equal-instant deltas are ordered (-1 before +1), so
 * an interval ending exactly when another starts never double
 * counts (end-exclusive semantics); rows tied on (instant, delta)
 * carry the same delta, so every tie order yields the same multiset
 * of prefix values and the same per-bucket max.
 */
object Sweep {

  /**
   * Per-bucket peak concurrency over half-open intervals
   * [`startUs`, `endUs`). Columns must be non-negative longs (epoch
   * micros — `div` bucketing misaligns on negatives). Output: one
   * row per bucket containing at least one endpoint, with `bucket`
   * (= instant div bucketUs), `peak` (max open intervals at any
   * endpoint instant within the bucket), and `n_deltas` (endpoint
   * rows in the bucket). Buckets with no endpoints hold their level
   * constant and are not emitted.
   */
  def peakConcurrent(
      intervals: DataFrame,
      startUs: String,
      endUs: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    // drop intervals with a NULL endpoint up front (asofJoin
    // precedent): a NULL bucket would sort first and fold its
    // unbalanced total into every real bucket's carry-in
    val live = intervals.filter(col(startUs).isNotNull && col(endUs).isNotNull)
    val deltas = live.select(col(startUs).as("t"), lit(1L).as("delta"))
      .unionAll(live.select(col(endUs).as("t"), lit(-1L).as("delta")))
      .withColumn("bucket", expr(s"t div ${bucketUs}L"))
    val inBucket = Window.partitionBy("bucket").orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = deltas
      .withColumn("run", sum("delta").over(inBucket))
      .groupBy("bucket")
      .agg(
        max("run").as("local_max"),
        sum("delta").as("total"),
        count(lit(1)).as("n_deltas"))
    // carry-in: cumulative prior-bucket totals. One row per bucket —
    // the single-partition window is over the bounded bucket domain.
    val overBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("carry_in", coalesce(sum("total").over(overBuckets), lit(0L)))
      .select(col("bucket"), (col("carry_in") + col("local_max")).as("peak"),
        col("n_deltas"))
  }
}
