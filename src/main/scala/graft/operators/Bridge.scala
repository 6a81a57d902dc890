package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Price–volume–mix revenue bridge (B102) — the FP&A "waterfall" that
 * decomposes a period-over-period revenue change into the effect of
 * price moves, the effect of quantity moves, and the contribution of
 * products that appeared or disappeared ("why is revenue up 4%?").
 * Warehouses hand-roll this per report, usually in float arithmetic
 * whose effects don't re-add to the actual delta.
 *
 * Decomposition (per item, then rolled up to the reporting group):
 * with q1,r1 / q2,r2 the item's period quantity and revenue (integer
 * cents),
 *
 *   - continuing items (q1>0, q2>0):
 *       volume = (q2 − q1) · r1 div q1      (quantity move at old price)
 *       price  = Δr − volume                (price + truncation residue)
 *   - new items (q1 = 0):            new_c  = r2
 *   - discontinued items (q2 = 0):   disc_c = −r1
 *
 * `price` is defined as the closure term, so per item — and therefore
 * per group, by linearity — the four effects sum EXACTLY to the
 * revenue delta: the bridge provably reconciles, no float drift, no
 * "rounding" row. Item-level classification aggregated to a coarser
 * group is what makes the mix effect real: a brand whose cheap parts
 * grew and expensive parts shrank shows offsetting volume/price terms
 * instead of a meaningless brand-average price.
 *
 * Scale: facts are touched ONCE by a map-side-combined (item, period)
 * rollup — the shuffle carries one row per item per period, never the
 * fact volume; the full-outer period alignment and the group rollup
 * both run on that item-sized relation. The volume product r1·(q2−q1)
 * runs in decimal(38,0): in bigint, cents × quantity silently wraps
 * once a single item's period revenue crosses ~9·10^18/|Δq| — the
 * silent-overflow class (B55) designed out up front.
 */
object Bridge {

  /**
   * Input: one fact row per (item, group, period-flag). `isP2` marks
   * rows of the comparison period; rows of neither period must be
   * filtered upstream. `qty` and `revCents` must be integral.
   * Output: one row per `group` with q1/q2/rev1_c/rev2_c/delta_c and
   * the four effect columns (volume_c, price_c, new_c, disc_c) whose
   * sum equals delta_c exactly.
   */
  def priceVolumeMix(
      facts: DataFrame,
      item: String,
      group: String,
      isP2: String,
      qty: String,
      revCents: String): DataFrame = {
    val byItem = facts
      .groupBy(col(item), col(group))
      .agg(
        sum(when(!col(isP2), col(qty)).otherwise(0L)).as("q1"),
        sum(when(!col(isP2), col(revCents)).otherwise(0L)).as("r1"),
        sum(when(col(isP2), col(qty)).otherwise(0L)).as("q2"),
        sum(when(col(isP2), col(revCents)).otherwise(0L)).as("r2"))
    val effects = byItem
      .withColumn("delta", col("r2") - col("r1"))
      .withColumn("volume",
        when(col("q1") > 0 && col("q2") > 0,
          expr("""cast((q2 - q1) as decimal(38,0)) * r1 div q1""")
            .cast("long"))
          .otherwise(0L))
      .withColumn("new_c",
        when(col("q1") === 0 && col("q2") > 0, col("r2")).otherwise(0L))
      .withColumn("disc_c",
        when(col("q2") === 0 && col("q1") > 0, -col("r1")).otherwise(0L))
      // the closure term unconditionally: price absorbs the truncation
      // residue AND any degenerate zero-qty-nonzero-revenue rows, so
      // volume+price+new+disc == delta holds identically per item
      .withColumn("price",
        col("delta") - col("volume") - col("new_c") - col("disc_c"))
    effects
      .groupBy(col(group))
      .agg(
        sum("q1").as("qty1"),
        sum("q2").as("qty2"),
        sum("r1").as("rev1_c"),
        sum("r2").as("rev2_c"),
        sum("delta").as("delta_c"),
        sum("volume").as("volume_c"),
        sum("price").as("price_c"),
        sum("new_c").as("new_c"),
        sum("disc_c").as("disc_c"))
  }
}
