package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension TYPE 2 build: turn a change/event log into
 * an effective-dated dimension — one row per (key, attribute-state)
 * interval with `valid_from`/`valid_to` and an `is_current` flag. The
 * temporal companion of `TableSink.upsert` (SCD-1: overwrite in
 * place); type 2 keeps history so a fact row can join the dimension
 * AS OF its own timestamp (see `AsOf.asofJoin`).
 *
 * Scale shape: two windows over the same (key → ts, tie) partition
 * order — change-point detection (lag) and interval close (lead) —
 * so the whole build is ONE shuffle on the key; consecutive rows with
 * unchanged attributes collapse before the second window, which is
 * narrow on the already-partitioned stream. Deterministic under ties
 * via the caller-supplied tie-break column (retries/partitionings
 * cannot reorder equal timestamps).
 */
object Scd {

  /** One row per attribute-state interval:
   * (key, attrs..., valid_from = tsCol of the change point,
   * valid_to = next change's ts or NULL, is_current). */
  def type2(changes: DataFrame, keyCol: String, tsCol: String,
            attrCols: Seq[String], tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val state = struct(attrCols.map(col): _*)
    changes
      .withColumn("_prev_state", lag(state, 1).over(w))
      // keep only change points (first row per key, or state differs)
      .filter(col("_prev_state").isNull || col("_prev_state") =!= state)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(col(keyCol)) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }

  /**
   * Point-in-time (temporal) join: attach to each fact row the
   * dimension state that was valid AT the fact's own timestamp —
   * the canonical warehouse pattern for joining facts to a type-2
   * dimension ("what segment was this customer in when they
   * bought"). A direct interval-containment join is a per-key range
   * probe; this rides [[AsOf.asofJoin]]'s one-exchange carry-forward
   * on `validFrom`: type-2 intervals tile each key's timeline, so
   * the latest valid_from <= ts IS the covering interval.
   *
   * Zero-width intervals (two change points at one instant — the
   * first covers nothing) are dropped up front, which also restores
   * the as-of (key, time)-uniqueness contract; the matched interval's
   * `validTo` is re-checked null-safely so hand-built dims with GAPS
   * in coverage yield a null state, never a stale one. Output: every
   * fact row plus one `pit_`-prefixed column per payload entry.
   */
  def pitJoin(
      facts: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, factTs: String,
      payload: Seq[String],
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val live = dim.filter(col(validTo).isNull || col(validFrom) =!= col(validTo))
    val joined = AsOf.asofJoin(facts, live, factKey, dimKey, factTs, validFrom,
      rightPayload = payload :+ validTo, outPrefix = "pit_")
    val covered = col(s"pit_$validTo").isNull || col(factTs) < col(s"pit_$validTo")
    payload.foldLeft(joined) { (df, c) =>
      df.withColumn(s"pit_$c", when(covered, col(s"pit_$c")))
    }.drop(s"pit_$validTo")
  }
}
