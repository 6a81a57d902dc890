package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Clamped running balance (B94) — the recurrence
 * y_t = max(0, y_{t−1} + x_t): a wallet / inventory / rate-limit
 * budget that cannot go negative, with an over-large debit PARTIALLY
 * absorbed down to zero. The recurrence looks inherently sequential
 * (each step depends on the clamped previous step — the textbook
 * "needs recursive SQL" example), but it has a closed form over the
 * PLAIN prefix sum p_t:
 *
 *     y_t = p_t − min(0, min_{s≤t} p_s)
 *
 * (induction: a clamp fires exactly when the raw prefix makes a new
 * minimum below zero, and the cumulative clamped-away amount is
 * precisely −min(0, running-min)). So the whole computation is TWO
 * running-frame windows over ONE per-key sort — the same single
 * keyed exchange any running sum pays, no recursion, no iteration,
 * no per-key sequential state. `rejected` (= y_t − p_t) is the
 * cumulative amount the clamp absorbed — the "declined withdrawals /
 * lost demand" measure the business actually asks for.
 *
 * Scale: one shuffle on `key`; both windows share the (key) partition
 * and (ord) sort. All-integer: exact under any engine replay.
 */
object Balance {

  /**
   * Per input row: `prefix` (raw running sum), `balance` (clamped),
   * `rejected` (cumulative clamped-away amount, ≥ 0). `ord` must
   * totally order rows within a key (pass a composite struct column
   * upstream if needed); `delta` must be integral.
   */
  def clampedRunningSum(df: DataFrame, key: String, ord: String, delta: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("prefix", sum(col(delta)).over(w))
      .withColumn("rejected",
        greatest(lit(0L), -min(col("prefix")).over(w)))
      .withColumn("balance", col("prefix") + col("rejected"))
  }

  /** Per-key end state: final balance, cumulative rejected amount,
   * raw net sum, and the row count — the account-summary rollup. */
  def clampedFinal(df: DataFrame, key: String, ord: String, delta: String): DataFrame =
    clampedRunningSum(df, key, ord, delta)
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_tx"),
        sum(col(delta)).as("net"),
        max("rejected").as("rejected_total"))
      .withColumn("final_balance", col("net") + col("rejected_total"))

  /**
   * One-sided CUSUM drift detection (B103) — the classic
   * change-point / SLO-burn alarm over a per-key metric series:
   *
   *     S_t = max(0, S_{t−1} + (x_t − ref − slack)),  alarm when S_t > h
   *
   * S_t accumulates only SUSTAINED excess over the reference level
   * (the slack forgives noise; any dip resets toward zero), so a level
   * shift fires within a few points while a single spike does not —
   * the reason monitoring uses CUSUM instead of per-point thresholds.
   * The recurrence is the clamped-balance recurrence with a shifted
   * delta, so it inherits [[clampedRunningSum]]'s prefix-min closed
   * form: TWO running windows over ONE per-key sort — no recursion,
   * no per-key sequential state, exactly the shuffle a running sum
   * pays. All-integer, replayable bit-for-bit.
   *
   * `ref` / `slack` / `h` are COLUMNS (per-key references joined
   * upstream — a global constant is the degenerate case), because at
   * scale the reference level is itself per-series (per-nation
   * baseline, per-tenant quota), never one number.
   *
   * Output: one row per key — points, max CUSUM reached, number of
   * points in alarm, and the ord of the FIRST alarm (null when the
   * series never crossed h). Ties on `ord` within a key must be
   * impossible upstream (pass a composite struct).
   */
  def cusumAlarms(df: DataFrame, key: String, ord: String, value: String,
      ref: String, slack: String, h: String): DataFrame = {
    val shifted = df.withColumn("_cusum_delta",
      col(value) - col(ref) - col(slack))
    val s = clampedRunningSum(shifted, key, ord, "_cusum_delta")
      .withColumn("_alarm", col("balance") > col(h))
    s.groupBy(col(key))
      .agg(
        count(lit(1)).as("n_points"),
        max("balance").as("max_cusum"),
        sum(when(col("_alarm"), 1L).otherwise(0L)).as("n_alarm"),
        min(when(col("_alarm"), col(ord))).as("first_alarm_ord"))
  }
}
