package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Banded range join: all (a, b) row pairs sharing a key whose times
 * lie within `bandUs` of each other — the interval/range join Spark
 * would otherwise plan as a per-key nested loop.
 *
 * Scale design: times are binned at band width; the `b` side is
 * replicated to its bin and both neighbors, then the join is a plain
 * EQUALITY join on (key, bin) followed by the exact band predicate.
 * Each qualifying pair meets exactly once (a keeps its single bin; b
 * has exactly one replica in that bin), so no dedup pass is needed.
 * Cost: one shuffle on (key, bin) and a 3x replication of b — never
 * the |key group|^2 blowup of a naive theta join, and bins keep hot
 * keys spread across reducers when time is spread.
 */
object Ranged {

  /**
   * All pairs with a.key = b.key and |a.time - b.time| <= bandUs.
   * Column sets of `a` and `b` must be disjoint (alias before calling,
   * e.g. for a self-join). Time columns must be non-negative longs
   * (epoch micros); `div` bins would misalign for negative values.
   */
  def bandedJoin(
      a: DataFrame,
      b: DataFrame,
      aKey: String,
      bKey: String,
      aTime: String,
      bTime: String,
      bandUs: Long): DataFrame = {
    require(bandUs > 0, "bandUs must be positive")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "alias a/b columns apart before a banded self-join")
    val a2 = a.withColumn("__bin", expr(s"`$aTime` div ${bandUs}L"))
    val b2 = b
      .withColumn("__b_bin", expr(s"`$bTime` div ${bandUs}L"))
      .withColumn("__bin", explode(array(col("__b_bin") - 1, col("__b_bin"), col("__b_bin") + 1)))
      .drop("__b_bin")
    a2.join(b2,
        a2("__bin") === b2("__bin") && a2(aKey) === b2(bKey) &&
          abs(a2(aTime) - b2(bTime)) <= bandUs)
      .drop(a2("__bin")).drop(b2("__bin"))
  }
}
