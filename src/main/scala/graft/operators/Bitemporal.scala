package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Bitemporal join (B92) — each fact row joined to the dimension
 * version that was BELIEVED CORRECT at the fact's own audit time,
 * about the state VALID at the fact's event time. Two independent
 * timelines: valid time (when the state was true in the world) and
 * system/knowledge time (when the warehouse learned it). The question
 * a plain SCD2 point-in-time join (B69) cannot answer: "was this row
 * priced against the original rate row or the correction that arrived
 * later?" — regulatory replay, restatement audits, model-training
 * leakage control ("only use what was known then").
 *
 * Knowledge model: the register form — a correction is a NEW row for
 * the same (key, valid interval) with a later `sysFrom`, superseding
 * the earlier one; no sys_to bookkeeping to maintain (the winner at
 * audit time A is simply the max sysFrom ≤ A). This is the append-only
 * shape a warehouse actually accumulates (A19's immutable publishes,
 * D14's LWW registers).
 *
 * Plan: one equi-join on the key with the temporal conditions as join
 * filters (valid containment + sysFrom ≤ audit), then a per-fact
 * window keeps the latest-knowledge match. Scale: the join shuffles
 * each side once on the key — dim rows per key are bounded by change
 * × correction counts (dimension history, not fact volume), so no
 * fan-out blowup; the resolve window partitions by the FACT id
 * (group size = matching versions, single digits), one further keyed
 * exchange. Left semantics: facts with no believable version at
 * their audit time survive null-padded — silently dropping them
 * would hide exactly the facts a restatement audit is looking for.
 */
object Bitemporal {

  /**
   * `facts` must carry a unique `factId`; `dim` rows are
   * (key, validFrom, validTo, sysFrom, payload...) with `validTo`
   * null for open intervals. `tieCol` breaks exact sysFrom ties
   * deterministically (e.g. a change sequence number). Output: every
   * fact row, plus `outPrefix`-prefixed payload columns and
   * `outPrefix+"sys_from"` from the winning version (null if none).
   */
  def bitemporalJoin(
      facts: DataFrame,
      dim: DataFrame,
      factId: String,
      factKey: String,
      dimKey: String,
      validAt: String,
      auditAt: String,
      validFrom: String,
      validTo: String,
      sysFrom: String,
      payload: Seq[String],
      tieCol: String,
      outPrefix: String = "bt_"): DataFrame = {
    val d = dim.select(
      col(dimKey).as("__bk") +: col(validFrom).as("__vf") +:
        col(validTo).as("__vt") +: col(sysFrom).as("__sf") +:
        col(tieCol).as("__tie") +:
        payload.map(c => col(c).as(s"$outPrefix$c")): _*)
    val cond = col(factKey) === col("__bk") &&
      col(validAt) >= col("__vf") &&
      (col("__vt").isNull || col(validAt) < col("__vt")) &&
      col("__sf") <= col(auditAt)
    val w = Window.partitionBy(col(factId))
      .orderBy(col("__sf").desc_nulls_last, col("__tie").desc_nulls_last)
    facts.join(d, cond, "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn(s"${outPrefix}sys_from", col("__sf"))
      .drop("__bk", "__vf", "__vt", "__sf", "__tie", "__rn")
  }
}
