package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global rank over a column's DISTINCT values — the
 * two-level formulation that replaces the textbook
 * `row_number().over(Window.orderBy(v))`, whose empty PARTITION BY
 * funnels every row through ONE reducer (the single-partition window
 * anti-pattern; fine at 10^3 dimension rows, a straggler at 10^9).
 *
 * Shape: split the value domain into `partitions` ordered ranges
 * (boundaries from ONE approx-percentile aggregate, collected once
 * and embedded as a literal break array — a pure function of the
 * value, so every later pass assigns ranges identically; NOT
 * `repartitionByRange`, whose per-job boundary SAMPLING would place
 * the offset pass and the rank pass in different partitions), rank
 * WITHIN each range (a partitioned window — every reducer sorts only
 * its own range), then add per-range prefix offsets computed from
 * the bounded range-count table (`partitions` rows, broadcast back).
 * Global rank = prefix offset + local rank. Total cost: the distinct
 * shuffle, one percentile aggregate, one partitioned sort, and a
 * `partitions`-row driver collect — no data-sized serial stage
 * anywhere, so the derivation survives a dimension 1000x this size.
 *
 * Determinism: ranks are a property of the value ORDER alone, so the
 * result is independent of where the percentile boundaries fall.
 */
object Rank {

  /**
   * (v, rank) for every distinct value of `valueCol` (cast to long),
   * rank 1-based ascending. `partitions` bounds the prefix-offset
   * table collected to the driver.
   */
  def distinctRanks(values: DataFrame, valueCol: String,
      partitions: Int = 32): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val base = values
      .select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .distinct()
    // ordered range boundaries: one bounded aggregate, collected once;
    // duplicates collapse (skewed domains just leave some ranges empty)
    val bounds: Array[Long] =
      if (partitions == 1) Array.empty
      else {
        val probs = (1 until partitions).map(_.toDouble / partitions)
        base.agg(percentile_approx(col("v"), typedLit(probs), lit(10000))
            .as("b"))
          .head().getSeq[Long](0).distinct.sorted.toArray
      }
    preDistinctRanks(base, "v", bounds)
  }

  /** The rank pass alone, over values the CALLER has already proven
   * DISTINCT, with precomputed range boundaries — lets an operator
   * that already runs a full aggregate (e.g. shardAssign's
   * uniqueness guard) derive the boundaries in that same pass instead
   * of paying [[distinctRanks]]' separate distinct shuffle +
   * percentile action (VERDICT r15 guard fold). `bounds` must be
   * sorted distinct longs (empty = one range); duplicate values in
   * `values` yield duplicate ranks — verify distinctness first. */
  def preDistinctRanks(values: DataFrame, valueCol: String,
      bounds: Array[Long]): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val base = values
      .select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
    val local = (if (bounds.isEmpty) base.withColumn("pid", lit(0))
      else base.withColumn("pid",
        graft.functions.expressions.searchSortedLong(col("v"), bounds)))
      .repartition(col("pid"))
      .withColumn("lr",
        row_number().over(Window.partitionBy("pid").orderBy("v")).cast("long"))
    // bounded prefix offsets: `partitions` rows to the driver, back as
    // a broadcast join — never a data-sized collect
    val counts = local.groupBy("pid").agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .toSeq.toDF("pid", "off")
    local.join(broadcast(offsets), "pid")
      .select(col("v"), (col("off") + col("lr")).as("rank"))
  }

  /** Every k-th distinct value in rank order (rank % k == 0),
   * ascending — the bounded break-array derivation for band lookups
   * (the result is 1/k-th of the dimension, collected by the CALLER
   * who asserts its own bound). */
  def everyKthDistinct(values: DataFrame, valueCol: String, k: Int,
      partitions: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    distinctRanks(values, valueCol, partitions)
      .filter(col("rank") % k === 0)
      .select("v")
      .orderBy("v")
  }
}
