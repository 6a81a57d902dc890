package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance — the batch half of a streaming
 * upsert pipeline (streaming/EventStream.upsertSink is the other).
 *
 * A recurring aggregate over a 100 TB fact table must not rescan
 * history on every refresh: aggregate ONLY the new delta partition
 * into the same partial shape as the maintained table, then merge
 * partials. Sums and counts merge as sums, min/max as min/max;
 * ratios/averages derive from (sum, count) at read time — which is
 * why the maintained table stores partials, never finished averages.
 *
 * The merge itself is one `unionByName` + hash aggregate: partials
 * combine map-side and one shuffle on the keys finishes the merge.
 * When the maintained table and the delta are both written bucketed
 * on the keys (sinks/TableSink.writeBucketed), even that exchange
 * disappears.
 */
object Incremental {

  /** Merge partial-aggregate tables sharing a key set. `merge` maps
   * each partial column to its combiner: "sum" (also for counts),
   * "min", or "max". */
  def mergePartials(parts: Seq[DataFrame], keys: Seq[String],
      merge: Seq[(String, String)]): DataFrame = {
    require(parts.nonEmpty, "need at least one partial table")
    require(merge.nonEmpty, "need at least one partial column")
    val aggs = merge.map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, how) => throw new IllegalArgumentException(
        s"unsupported combiner '$how' for $c (sum|min|max; counts merge as sum)")
    }
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Mergeable quantile partials — the missing member of the
   * incremental family ([[mergePartials]] covers sum/count/min/max,
   * B47's HLL sketches cover distinct counts; quantiles need their
   * own mergeable state). The state is a fixed-width integer
   * histogram over a LONG value column: (bucket = value div width,
   * cnt). Histograms merge by summing bucket counts — literally
   * `mergePartials(parts, Seq("bucket"), Seq("cnt" -> "sum"))` — so a
   * daily refresh aggregates only the delta and the quantile error is
   * a DECLARED bound (± width), not a sketch heuristic. Integer
   * bucket arithmetic end-to-end: the same histogram is
   * bit-reproducible in any engine, so merge ≡ full-recompute is
   * oracle-checkable (unlike t-digest/GK state).
   *
   * Values must be non-negative: Spark's `div` truncates toward zero
   * while SQL floor-division floors, so negative values would bucket
   * differently cross-engine (shift into non-negative space first).
   */
  def histogramPartial(df: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // the width travels WITH the state: partials built at different
    // widths share bucket ids but mean different value ranges, and a
    // blind bucket-sum merge would silently mis-bucket — the
    // operational mistake a daily pipeline eventually makes when a
    // config change lands mid-history. mergeHistograms refuses loudly.
    df.select(expr(s"`$valueCol` div ${width}L").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("width", lit(width))
  }

  /** Merge width-stamped histogram partials. Same-width agreement is
   * enforced INSIDE the merge job (a declarative raise_error over the
   * KB-sized merged state — no extra action, so nothing rescans the
   * fact table): mixed widths fail the job, never mis-bucket. */
  def mergeHistograms(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "need at least one histogram partial")
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    parts.reduce(_ unionByName _)
      .groupBy("bucket")
      .agg(sum(col("cnt")).as("cnt"),
        min(col("width")).as("__wlo"), max(col("width")).as("__whi"))
      .withColumn("__glo", min(col("__wlo")).over(wAll))
      .withColumn("__ghi", max(col("__whi")).over(wAll))
      .select(col("bucket"),
        when(col("__glo") === col("__ghi"), col("cnt"))
          .otherwise(raise_error(format_string(
            "refusing to merge histograms of mixed widths %d and %d: " +
              "same-width partials required (rebuild the narrower side)",
            col("__glo"), col("__ghi")))).as("cnt"),
        col("__glo").as("width"))
  }

  /**
   * The q-quantile's bucket from a (merged) histogram: the first
   * bucket whose cumulative count reaches ceil(q·n). Returns one row
   * (n_rows, q_lo) where q_lo = bucket·width is the bucket's lower
   * edge — the exact q-quantile is guaranteed in [q_lo, q_lo+width).
   * The cumulative window runs unpartitioned ON PURPOSE: the
   * histogram IS the bounded sketch state (value_range/width rows,
   * KBs by construction — width is the state-size/accuracy dial),
   * never the data.
   */
  def quantileFromHistogram(hist: DataFrame, width: Long, q: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    require(q > 0.0 && q <= 1.0, "q must be in (0, 1]")
    // a width-stamped histogram must agree with the caller's width —
    // q_lo = bucket·width is silently wrong otherwise (declarative
    // guard, same zero-extra-action shape as mergeHistograms)
    val checked =
      if (!hist.columns.contains("width")) hist
      else hist.withColumn("cnt",
        when(col("width") === lit(width), col("cnt"))
          .otherwise(raise_error(format_string(
            s"histogram width %d != requested width $width", col("width")))))
    val tot = checked.agg(sum(col("cnt")).as("n_rows"))
    checked.withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bucket"))))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= greatest(lit(1L), ceil(lit(q) * col("n_rows")).cast("long")))
      .groupBy("n_rows")
      .agg(min(col("bucket")).as("qb"))
      .select(col("n_rows"), (col("qb") * width).as("q_lo"))
  }

  /**
   * Incremental inner-equi-join view maintenance under inserts
   * (classic delta rule): Δ(A ⋈ B) = ΔA ⋈ B_old ∪ A_old ⋈ ΔB
   * ∪ ΔA ⋈ ΔB, folded here as ΔA ⋈ (B_old ∪ ΔB) ∪ A_old ⋈ ΔB —
   * every term joins a DELTA against something, so a daily refresh
   * of a 100 TB joined view shuffles delta-sized inputs only
   * (A_old/B_old enter as the probe side of delta-keyed joins,
   * prunable by partition/bucket on the join key; the old×old
   * product — the full-rebuild cost — is never recomputed).
   * Column sets must be disjoint; the maintained view's refresh is
   * `view_old unionByName deltaJoin(...)`.
   */
  def deltaJoin(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      aKey: String, bKey: String): DataFrame = {
    require(aOld.columns.toSet.intersect(bOld.columns.toSet).isEmpty,
      "deltaJoin: alias the two sides' columns apart first")
    val bNew = bOld.unionByName(bDelta)
    aDelta.join(bNew, col(aKey) === col(bKey))
      .unionByName(aOld.join(bDelta, col(aKey) === col(bKey)))
  }
}
