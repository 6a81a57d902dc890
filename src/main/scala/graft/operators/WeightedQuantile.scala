package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact weighted quantiles without a global sort. The q-weighted
 * quantile (min value v whose cumulative weight reaches ceil(q·W))
 * naively needs all rows sorted by value with a running weight sum —
 * a single-partition window over the whole fact table.
 *
 * Scale design (two-level, same bucket-domain trick as Sweep): a
 * first scan aggregates weights per coarse value BUCKET (map-side
 * combined, output bounded by value_range/width); a cumulative pass
 * over the bounded bucket rows locates each quantile's target bucket
 * and its carry-in weight; a second scan touches ONLY the target
 * buckets' rows and resolves the exact value with a within-bucket
 * running sum (bounded by the bucket width, not the data). Two
 * data-sized scans, zero data-sized sorts, all integer arithmetic —
 * exact and engine-reproducible, unlike interpolation-based
 * approximations.
 */
object WeightedQuantile {

  /**
   * One row per requested quantile: (`q_ppm`, `value`) where `value`
   * is the smallest value column entry whose cumulative weight
   * reaches ceil(q_ppm·W / 1e6). `value` must be a non-negative long
   * (div-bucketing), `weight` a positive long; `ppms` in (0, 1e6].
   */
  def weightedQuantiles(
      df: DataFrame,
      value: String,
      weight: String,
      ppms: Seq[Long],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(ppms.nonEmpty && ppms.forall(p => p > 0 && p <= 1000000L),
      "quantile ppms must be in (0, 1e6]")
    val spark = df.sparkSession
    import spark.implicits._
    val f = df.select(col(value).cast("long").as("v"),
      col(weight).cast("long").as("w"))
      .withColumn("bucket", expr(s"v div ${bucketWidth}L"))
    val perBucket = f.groupBy("bucket").agg(sum("w").as("bw"))
    val tot = perBucket.agg(sum("bw").as("tw"))
    // bounded bucket domain: the unpartitioned window is over
    // value_range/width rows, never the data
    val cum = perBucket.withColumn("cum_before",
      coalesce(sum("bw").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val targets = cum
      .crossJoin(broadcast(ppms.toDF("q_ppm")))
      .crossJoin(broadcast(tot))
      // overflow-safe ceil(q_ppm·tw / 1e6): tw = a·1e6 + b splits the
      // product so neither term exceeds ~tw (q_ppm·tw itself wraps a
      // long once total weight passes ~9.2e12 — squarely in range for
      // duration-weighted sums)
      .withColumn("r", expr(
        "(tw div 1000000L) * q_ppm + ((tw % 1000000L) * q_ppm + 999999L) div 1000000L"))
      .filter(col("cum_before") + col("bw") >= col("r"))
      .groupBy("q_ppm", "r")
      // min struct = lexicographic: the lowest qualifying bucket,
      // carrying its own cum_before
      .agg(min(struct(col("bucket"), col("cum_before"))).as("tb"))
      .select(col("q_ppm"), col("r"),
        col("tb.bucket").as("bucket"), col("tb.cum_before").as("cb"))
    // exact resolve inside the target buckets only
    f.join(broadcast(targets), "bucket")
      .groupBy("q_ppm", "r", "cb", "v").agg(sum("w").as("vw"))
      .withColumn("cum_in", sum("vw").over(
        Window.partitionBy("q_ppm").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cb") + col("cum_in") >= col("r"))
      .groupBy("q_ppm").agg(min("v").as("value"))
  }
}
