package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-group Gini concentration index (B91) — the standard inequality
 * measure over a non-negative value distribution within each group
 * ("how skewed is customer spend inside each nation / token mass
 * inside each source"). Complements B82's decile report: B82
 * deliberately avoids the GLOBAL rank a whole-population Gini needs;
 * here the rank window is PARTITIONED by the group key, so the sort
 * is the ordinary within-key sort every keyed window pays — bounded
 * by the group size, never a single-partition funnel.
 *
 * Exactness: with members ranked 1..n by (value, tiebreak) inside a
 * group, Gini = Σ(2i − n − 1)·x_i / (n·Σx). Tied values occupy
 * consecutive ranks, and Σ i·x over a tied block is x·Σi — invariant
 * under the block's internal order — so the index is deterministic
 * even though row_number splits ties arbitrarily; the explicit
 * tiebreak column just makes the intermediate relation itself
 * reproducible. All sums run in decimal(38,0) (i·x reaches
 * n²·max(x) ≈ 10²⁵ at 10⁹-member groups — bigint Σi·x silently needs
 * < 9.2·10¹⁸, the B55 overflow class), and the final index is the
 * integral quotient ·10⁶ (ppm), which DuckDB replays bit-for-bit in
 * HUGEINT.
 *
 * Scale: one shuffle on the group key; the rank window and the group
 * rollup reuse that partitioning — a single exchange + within-key
 * sort, O(group) memory never held (window + partial agg stream).
 */
object Concentration {

  /**
   * One row per group: `n`, `sum_v`, and `gini_ppm` ∈ [0, 1e6).
   * `value` must be a non-negative integral column (cast/scale
   * upstream); negative values would make the index meaningless, so
   * they fail loudly. `tiebreak` totally orders rows within a group.
   */
  def giniPpm(df: DataFrame, group: Seq[String], value: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(col(value), col(tiebreak))
    val dec = "decimal(38,0)"
    // guard folded INTO the consumed value — a standalone guard column
    // would be pruned as unused and never evaluate
    val guarded = when(col(value) < 0,
      raise_error(concat(lit(s"giniPpm: negative $value — index undefined: "),
        col(value).cast("string")))).otherwise(col(value))
    df
      .withColumn("__v", guarded)
      .withColumn("__i", row_number().over(w).cast(dec))
      .groupBy(group.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("sum_v"),
        sum(col("__i") * col("__v").cast(dec)).as("__six"))
      .withColumn("gini_ppm",
        expr(s"""(2 * __six - (cast(n as $dec) + 1) * cast(sum_v as $dec))
                 * 1000000 div (cast(n as $dec) * cast(sum_v as $dec))"""))
      .drop("__six")
  }
}
