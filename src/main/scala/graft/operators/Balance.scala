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
}
