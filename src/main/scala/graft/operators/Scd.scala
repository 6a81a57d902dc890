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
}
