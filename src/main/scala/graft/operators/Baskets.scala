package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket pair statistics (B96) — support / confidence / lift
 * for item pairs that co-occur in a basket (orders, sessions,
 * prompt+tool bundles): the association-rule core ("customers who
 * bought A also bought B", "co-retrieved documents"), which Spark
 * offers only through MLlib's FPGrowth (model-shaped, not relational).
 *
 * Scale: baskets collapse to DISTINCT (basket, item) pairs in one
 * map-side-combined aggregation; the pair generation is a per-basket
 * self-join (equi on basket id, itemA < itemB), so its output is
 * Σ (k_b choose 2) over basket sizes — bounded by basket width, the
 * quantity a retailer's basket naturally caps, NOT by item-domain².
 * `minPairCount` prunes the long tail before the marginal joins
 * (Apriori's support threshold); marginals and the 1-row basket total
 * broadcast. All ratios are exact integer ppm; the lift numerator
 * runs in decimal(38,0) (n_ab·N·10⁶ overflows bigint at ~10⁸ baskets
 * — the B55 class, designed out).
 *
 * Lift semantics: lift_ppm = 10⁶ · P(ab) / (P(a)·P(b)) — 10⁶ means
 * independence, above means affinity, below means substitution.
 */
object Baskets {

  /** One row per unordered co-occurring pair (item_a < item_b):
   * `n_pair`, each side's basket count, `support_ppm`,
   * `conf_a_to_b_ppm`, `conf_b_to_a_ppm`, `lift_ppm`. */
  def pairStats(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be >= 1")
    val bi = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull && col("__b").isNotNull)
      .distinct()
    val n = bi.agg(countDistinct("__b").as("__n"))
    val marg = bi.groupBy(col("__i")).agg(count(lit(1)).as("__cnt"))
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairs
      .join(broadcast(marg.select(col("__i").as("item_a"), col("__cnt").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(marg.select(col("__i").as("item_b"), col("__cnt").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(n))
      .withColumn("support_ppm", expr("n_pair * 1000000 div __n"))
      .withColumn("conf_a_to_b_ppm", expr("n_pair * 1000000 div n_a"))
      .withColumn("conf_b_to_a_ppm", expr("n_pair * 1000000 div n_b"))
      .withColumn("lift_ppm", expr(
        """cast(n_pair as decimal(38,0)) * __n * 1000000
           div (cast(n_a as decimal(38,0)) * n_b)"""))
      .select("item_a", "item_b", "n_pair", "n_a", "n_b", "support_ppm",
        "conf_a_to_b_ppm", "conf_b_to_a_ppm", "lift_ppm")
  }
}
