package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Join preflight diagnostics — the "why is this join 10 TB" report
 * run BEFORE an expensive equi-join: output volume is
 * Σ_k cntA(k)·cntB(k), almost always dominated by a handful of hot
 * keys, and knowing them up front decides broadcast vs salt vs
 * filter (operators.Skew.saltedJoin is the fix this report
 * motivates).
 *
 * Scale shape: each side collapses to (key, cnt) with map-side
 * partial aggregation — the shuffles carry one row per DISTINCT key,
 * never the fact rows; the two count tables (key-cardinality-sized)
 * full-outer-join on key so keys missing from either side still
 * report (they produce zero output rows — also useful to see); the
 * top-N by output contribution is a TakeOrdered under a total order,
 * never a global sort.
 */
object JoinDiag {

  /** Top-`topN` join keys by output contribution: (`key`, `n_left`,
   * `n_right`, `out_rows` = n_left·n_right), ties broken by key. */
  def joinProfile(
      a: DataFrame, b: DataFrame,
      aKey: String, bKey: String,
      topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val ca = a.groupBy(col(aKey).as("key")).agg(count(lit(1)).as("n_left"))
    val cb = b.groupBy(col(bKey).as("key")).agg(count(lit(1)).as("n_right"))
    ca.join(cb, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topN)
  }
}
