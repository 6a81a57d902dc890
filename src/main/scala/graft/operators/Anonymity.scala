package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-anonymity audit (C65) — before a table (or a training corpus's
 * metadata sidecar) is released, every combination of quasi-identifier
 * columns must be shared by at least k rows, or the rare combination
 * re-identifies its members by linkage (the classic
 * zip+birthdate+gender failure). The audit reports each violating
 * equivalence class and a per-table summary — the evidence a release
 * gate suppresses or generalizes on.
 *
 * Scale: ONE hash aggregation over the quasi-identifier projection
 * (map-side combined — the shuffle carries distinct QI combinations,
 * not rows), then a filter; the summary is a second aggregation over
 * the combination relation, which is bounded by the QI domain, never
 * the row count. No joins, no windows, nothing row-sized moves twice.
 * NULL is a QI value like any other (a null zip code still links), so
 * classes group null-safely — the default groupBy semantics.
 */
object Anonymity {

  /** One row per violating equivalence class: the QI columns plus
   * `class_size` (< k). Row order is unspecified; sort downstream. */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymity: no quasi-identifier columns")
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** One-row summary: classes / rows total, violating classes / rows
   * at risk, and the table's actual anonymity level (min class size —
   * the largest k the table already satisfies). */
  def kAnonymitySummary(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymity: no quasi-identifier columns")
    require(k >= 2, s"kAnonymity: k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum("__n").as("n_rows"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating_classes"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("n_rows_at_risk"),
        min("__n").as("anonymity_level"))
      .withColumn("risk_ppm", expr("n_rows_at_risk * 1000000 div n_rows"))
      .withColumn("satisfies_k", col("anonymity_level") >= k)
  }
}
