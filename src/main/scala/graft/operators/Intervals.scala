package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Union-of-intervals coverage (B90) — per key, the total length of
 * time covered by at least one interval, with overlaps counted ONCE
 * (machine utilization, user active time, SLA uptime). Distinct from
 * [[Islands]] (consecutive integer positions) and [[Sweep]] (point-in
 * -time concurrency): here the primitive is arbitrary overlapping
 * [start, end) ranges and the answer is measure-of-union.
 *
 * Algorithm: the merged-segments sweep, expressed as two window
 * passes over ONE per-key sort. Ordered by (start, end), an interval
 * opens a new segment exactly when its start exceeds the running max
 * end of every earlier interval; a running sum over that flag labels
 * each row with its segment id; segments chain-overlap by
 * construction, so each segment's covered length is simply
 * max(end) − min(start). No self-join, no per-unit explode — an
 * interval spanning a year costs one row, not 365.
 *
 * Scale: one shuffle on `key`; both windows and the segment/key
 * rollups reuse the same (key) partitioning and (start, end) sort, so
 * the whole operator is a single exchange + single sort regardless of
 * interval count or span. Per-key state is the sort buffer only —
 * no segment list is held. Degenerate/invalid rows (end ≤ start)
 * would silently corrupt the running max; they are counted and
 * EXCLUDED, with the count surfaced per key (fail-visible, B73/B74
 * discipline).
 */
object Intervals {

  /**
   * One row per key: `n_intervals`, `n_segments` (merged disjoint
   * runs), `covered` (union measure, in the unit of `start`/`end`),
   * `span` (max end − min start) and `n_invalid` (dropped rows with
   * end ≤ start). `start`/`end` must be integral (cast upstream).
   */
  /**
   * The merged disjoint runs themselves (B120) — one row per maximal
   * overlapping-or-touching run of intervals per key: (key, seg_idx
   * 1-based in time order, seg_start, seg_end, n_merged). The classic
   * "merge overlapping intervals" relation [[unionCoverage]] summarizes
   * — emitted for consumers that need the runs (maintenance windows,
   * consolidated sessions, blackout calendars). Segment detection is
   * the per-key prefix-max sweep: a row opens a new run iff its start
   * clears every earlier end; windows partition BY KEY (data-sized
   * parallelism, no global sort). Rows with end ≤ start are dropped
   * here (the coverage report counts them).
   */
  def mergedSegments(df: DataFrame, key: String, start: String, end: String): DataFrame = {
    val valid = df.filter(col(end) > col(start))
    val w = Window.partitionBy(key).orderBy(col(start), col(end))
    val prevMax = max(col(end)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    valid
      .withColumn("__new_seg",
        (col(start) > coalesce(prevMax, lit(Long.MinValue))).cast("long"))
      .withColumn("__seg",
        sum(col("__new_seg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("__seg"))
      .agg(min(col(start)).as("seg_start"), max(col(end)).as("seg_end"),
        count(lit(1)).as("n_merged"))
      .select(col(key), col("__seg").as("seg_idx"), col("seg_start"),
        col("seg_end"), col("n_merged"))
  }

  def unionCoverage(df: DataFrame, key: String, start: String, end: String): DataFrame = {
    val invalid = df.filter(col(end) <= col(start))
      .groupBy(col(key)).agg(count(lit(1)).as("n_invalid"))
    val seg = mergedSegments(df, key, start, end)
      .select(col(key), col("seg_start").as("__s"), col("seg_end").as("__e"),
        col("n_merged").as("__n"))
    seg.groupBy(col(key))
      .agg(
        sum("__n").as("n_intervals"),
        count(lit(1)).as("n_segments"),
        sum(col("__e") - col("__s")).as("covered"),
        (max("__e") - min("__s")).as("span"))
      .join(invalid, Seq(key), "left")
      .withColumn("n_invalid", coalesce(col("n_invalid"), lit(0L)))
  }
}
