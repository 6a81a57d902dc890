package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for each left row, attach the one right row with the
 * greatest right-time <= left-time for the same key (backward,
 * inclusive — the time-series ASOF JOIN Spark has no built-in for).
 *
 * Spark-first design: not a per-row range probe (quadratic per key)
 * and not a custom SparkPlan. Both sides are tagged and unioned, each
 * key partition is sorted by (time, tag), and the latest right payload
 * is carried forward with last(_, ignoreNulls) over a running window.
 * Catalyst plans this as ONE exchange + sort — the cost of a single
 * sort-merge join at any scale, with no key-cardinality blowup when a
 * hot key has millions of rows on both sides.
 */
object AsOf {

  /**
   * Inclusive as-of join; `direction` selects the match:
   *  - "backward" (default): greatest right-time <= left-time;
   *  - "forward": smallest right-time >= left-time.
   *
   * Output: every `left` row with its columns unchanged, plus one
   * `outPrefix`-prefixed column per `rightPayload` entry holding the
   * value from the matched right row (null when the key has no right
   * row on the match side of the left time).
   *
   * Requirements:
   *  - time columns are totally ordered within a key (any orderable
   *    type; use epoch micros for timestamps to avoid tz surprises);
   *  - `right` is unique per (key, time): pre-aggregate conflicting
   *    rows first, otherwise the surviving row among equal timestamps
   *    is partition-order-dependent.
   *
   * A match tolerance falls out compositionally: put the right time
   * in `rightPayload` and filter on the emitted gap afterwards.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      outPrefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one right column")
    require(Set("backward", "forward").contains(direction),
      s"direction must be 'backward' or 'forward', got '$direction'")
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    // the whole payload travels as ONE struct: the carry-forward then
    // always yields fields of a single right row (a per-column carry
    // would tear the match when a field of the true match is NULL, and
    // ignoreNulls could not tell "NULL field" from "no right row")
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    // right rows (tag 0) sort before left rows (tag 1) at equal time,
    // so a right row AT the left timestamp matches — inclusive join.
    // NULL keys/times never participate: SQL joins don't match on NULL,
    // and a NULL time has no place in the time order — filter right
    // rows up front (NULL-key left rows then sit in a partition with no
    // right rows and correctly get a NULL payload).
    val l2 = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__tag"),
      leftStruct.as("__lrow"), lit(null).cast(payloadType).as("__rpay"))
    val r2 = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
        lit(null).cast(left.schema).as("__lrow"),
        struct(rightPayload.map(col).toIndexedSeq: _*).as("__rpay"))
    // forward = the same carry-forward scanned from the future: time
    // descending, right rows still first at equal time (inclusive).
    // NULLS FIRST in BOTH directions: a NULL-time left row must sort
    // before every right row so the carry-forward has seen nothing and
    // correctly yields a NULL payload (desc's default NULLS LAST would
    // hand it the key's earliest right row).
    val timeOrder =
      if (direction == "backward") col("__t").asc_nulls_first
      else col("__t").desc_nulls_first
    val w = Window.partitionBy("__k").orderBy(timeOrder, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .select(col("__tag"), col("__lrow"),
        last(col("__rpay"), ignoreNulls = true).over(w).as("__fpay"))
      .filter(col("__tag") === 1)
      .select(
        (left.columns.map(c => col("__lrow").getField(c).as(c)) ++
          rightPayload.map(c => col("__fpay").getField(c).as(s"$outPrefix$c"))).toIndexedSeq: _*)
  }

  /**
   * NEAREST as-of join (B15c): for each left row, the right row with
   * the smallest |right-time − left-time| for the same key, searching
   * BOTH directions — the sensor-fusion / quote-matching variant
   * (match the closest reading, not the latest). Ties (equal gap both
   * sides) resolve BACKWARD deterministically. `maxGap` (same units
   * as the time columns, which must be integral — epoch micros) nulls
   * out matches farther than the tolerance instead of dropping the
   * left row.
   *
   * Composition, not a new kernel: one backward and one forward
   * [[asofJoin]] (each ONE exchange + sort on the key), then a
   * row-local argmin over the two candidates — 2 sort-merge passes
   * total, no range probe, no per-key blowup. Output: every left row
   * + `outPrefix`-payload columns from the winning side +
   * `<outPrefix>gap` (null when no match within tolerance).
   */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      outPrefix: String = "near_",
      maxGap: Option[Long] = None): DataFrame = {
    val payloadWithT = (rightPayload :+ rightTime).distinct
    val b = asofJoin(left, right, leftKey, rightKey, leftTime, rightTime,
      payloadWithT, "__b_", "backward")
    val both = asofJoin(b, right, leftKey, rightKey, leftTime, rightTime,
      payloadWithT, "__f_", "forward")
    val bt = col(s"__b_$rightTime").cast("long")
    val ft = col(s"__f_$rightTime").cast("long")
    val lt = col(leftTime).cast("long")
    val bGap = lt - bt
    val fGap = ft - lt
    // backward wins ties; a side with no match loses to any match
    val backWins = bt.isNotNull && (ft.isNull || bGap <= fGap)
    val gap0 = when(backWins, bGap).otherwise(fGap)
    val inTol = maxGap.map(g => gap0 <= g).getOrElse(lit(true))
    val picked = rightPayload.map { c =>
      when(inTol && backWins, col(s"__b_$c"))
        .when(inTol && !backWins, col(s"__f_$c"))
        .as(s"$outPrefix$c")
    }
    both.select(
      (left.columns.map(col) ++ picked :+
        when(inTol, gap0).as(s"${outPrefix}gap")).toIndexedSeq: _*)
  }
}
