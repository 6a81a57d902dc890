package graft.operators

import org.apache.spark.sql.DataFrame
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
}
