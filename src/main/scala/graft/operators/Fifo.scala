package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * FIFO lot matching (B95) — assign every outflow (sale / consumption /
 * return-to-vendor) its cost basis from the oldest unconsumed inflows
 * of the same key: inventory COGS, tax-lot accounting, battery/quota
 * depletion. The textbook implementation is a per-key sequential
 * two-pointer walk (or recursive SQL); neither distributes.
 *
 * The distributed formulation: place both sides on the key's
 * CUMULATIVE-QUANTITY axis — inflow i owns the half-open interval
 * [cumIn_{i−1}, cumIn_i), outflow j owns [cumOut_{j−1}, cumOut_j) —
 * and FIFO matching IS interval intersection on that axis: outflow j
 * consumes `overlap(i, j)` units of lot i, because units are consumed
 * in exactly the order they arrived. No pointer walk, no recursion:
 * two prefix-sum windows (one per side, same keyed sort) and one
 * intersection join.
 *
 * Semantics note: this is PERIODIC FIFO costing over the complete
 * ledger — the k-th unit out is costed against the k-th unit in, each
 * side in its own order; time-causality between the sides is not
 * enforced (a stockout borrows its basis from the next arrival, the
 * convention of period-end cost accounting). For the perpetual
 * variant — outflows beyond on-hand stock REJECTED at their moment —
 * clamp the movement log with [[Balance.clampedRunningSum]] first and
 * feed the accepted quantities here.
 *
 * Scale: the intersection join rides [[Ranged.bandedJoin]] on the
 * interval START, band = the largest single-transaction quantity L
 * (overlapping intervals start within L of each other) — one
 * (key, bin) equi-shuffle with 3× replication of one side, never the
 * per-key |in|×|out| nested loop. Matched-pair count is linear:
 * every overlap advances at least one side's cumulative boundary, so
 * output ≤ |in| + |out| per key. L is collected as ONE bounded
 * scalar (the band-lookup precedent for plan-embedded dim state).
 * Oversold keys (outflow beyond total inflow) surface as
 * `unmatched_qty` — never silently costed at zero.
 */
object Fifo {

  /**
   * `txns`: one row per movement with `key`, an orderable `ord`
   * column (composite struct upstream if needed), integral `qty` > 0,
   * `isOut` boolean, and `unitCost` (cost per unit for INFLOW rows;
   * ignored on outflows). Returns one row per key: `cogs` (Σ matched
   * units × inflow unit cost), `matched_qty`, `in_qty`, `out_qty`,
   * and `unmatched_qty` (= out_qty − matched_qty ≥ 0).
   */
  def fifoCogs(txns: DataFrame, key: String, ord: String, qty: String,
      isOut: String, unitCost: String): DataFrame = {
    val w = Window.partitionBy(key, isOut).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranged = txns
      .withColumn("__hi", sum(col(qty)).over(w))
      .withColumn("__lo", col("__hi") - col(qty))
    val ins = ranged.filter(!col(isOut)).select(col(key).as("__ik"),
      col("__lo").as("__ilo"), col("__hi").as("__ihi"),
      col(unitCost).as("__icost"))
    val outs = ranged.filter(col(isOut)).select(col(key).as("__ok"),
      col("__lo").as("__olo"), col("__hi").as("__ohi"))
    // overlapping intervals start within L of each other; L is the
    // largest single movement — one bounded scalar
    val bandRow = txns.agg(max(col(qty))).head()
    val band = if (bandRow.isNullAt(0)) 1L else math.max(1L, bandRow.getLong(0))
    val pairs = Ranged.bandedJoin(outs, ins, "__ok", "__ik", "__olo", "__ilo", band)
      .withColumn("__overlap",
        least(col("__ihi"), col("__ohi")) - greatest(col("__ilo"), col("__olo")))
      .filter(col("__overlap") > 0)
    val matched = pairs.groupBy(col("__ok").as(key))
      .agg(sum(col("__overlap") * col("__icost")).as("cogs"),
        sum(col("__overlap")).as("matched_qty"))
    val totals = ranged.groupBy(col(key))
      .agg(sum(when(col(isOut), col(qty)).otherwise(0L)).as("out_qty"),
        sum(when(col(isOut), lit(0L)).otherwise(col(qty))).as("in_qty"))
    totals.join(matched, Seq(key), "left")
      .withColumn("cogs", coalesce(col("cogs"), lit(0L)))
      .withColumn("matched_qty", coalesce(col("matched_qty"), lit(0L)))
      .withColumn("unmatched_qty", col("out_qty") - col("matched_qty"))
  }

  /**
   * Inventory aging report (B105) — what's ON HAND after FIFO
   * consumption, bucketed by lot age: the balance-sheet / write-down
   * complement of [[fifoCogs]] ("how much stock is older than a
   * year, and what is it worth"). Under FIFO the remnant of lot i is
   * pure arithmetic on the same cumulative axis:
   *
   *     remaining_i = max(0, cumIn_i − max(cumIn_{i−1}, totalOut))
   *
   * — the oldest lots are consumed first, so everything below the
   * key's total outflow is gone and everything above survives. NO
   * intersection join at all this time: one prefix-sum window over
   * the inflow sort plus a key-sized total-outflow aggregate joined
   * back (co-partitioned on the key). Oversold keys surface as zero
   * remnant everywhere, never negative stock.
   *
   * `ordDay` is the lot's integral acquisition day; age = asOfDay −
   * ordDay, classified by ascending `breaks` into "000-b1" /
   * "b1+1-b2" / … / "bn+1+" labels (zero-padded → label order IS age
   * order). Lot values run in decimal(38,0) — a bigint qty×cost
   * product wraps silently at warehouse scale (the B55 class).
   */
  def agingBuckets(txns: DataFrame, key: String, ord: String, ordDay: String,
      qty: String, isOut: String, unitCost: String, asOfDay: Long,
      breaks: Seq[Long]): DataFrame = {
    require(breaks.nonEmpty && breaks == breaks.sorted,
      s"agingBuckets: breaks must be ascending, got $breaks")
    val w = Window.partitionBy(key, isOut).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = txns
      .withColumn("__hi", sum(col(qty)).over(w))
      .withColumn("__lo", col("__hi") - col(qty))
    val outTot = txns.filter(col(isOut))
      .groupBy(col(key)).agg(sum(col(qty)).as("__out"))
    // pad to the widest boundary so label order IS age order
    val padW = math.max(3, (breaks.last + 1).toString.length)
    def pad(v: Long) = ("%0" + padW + "d").format(v)
    val age = lit(asOfDay) - col(ordDay)
    val bucket = {
      val first = when(age <= breaks.head, lit(s"${pad(0)}-${pad(breaks.head)}"))
      val mid = breaks.sliding(2).foldLeft(first) {
        case (acc, Seq(lo, hi)) =>
          acc.when(age <= hi, lit(s"${pad(lo + 1)}-${pad(hi)}"))
        case (acc, _) => acc
      }
      mid.otherwise(lit(s"${pad(breaks.last + 1)}+"))
    }
    cum.filter(!col(isOut))
      .join(outTot, Seq(key), "left")
      .withColumn("__rem",
        greatest(lit(0L),
          col("__hi") - greatest(col("__lo"), coalesce(col("__out"), lit(0L)))))
      .filter(col("__rem") > 0)
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_lots"),
        sum("__rem").as("on_hand_qty"),
        sum(expr(s"cast(__rem as decimal(38,0)) * $unitCost"))
          .cast("long").as("on_hand_value_cents"))
  }
}
