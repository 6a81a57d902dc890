package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Chi-square independence audit between two categorical columns
 * (B86) — the statistical test behind "is segment independent of
 * priority / device of outcome", run as a warehouse audit rather than
 * a notebook sample. The textbook float pipeline (expected counts
 * E = R·C/T, Σ(O−E)²/E) accumulates division error per cell and isn't
 * replayable; the algebraically identical per-cell form
 *
 *   (O·T − R·C)² / (T·R·C)      [ = (O−E)²/E ]
 *
 * is computed here entirely in exact decimal(38,0) integer arithmetic,
 * emitted per cell as a truncated ppm quotient — so the statistic is a
 * pure function of the counts, bit-replayable in any engine with
 * 128-bit integers.
 *
 * Scale shape: the data is touched ONCE by a map-side-combined
 * (a, b) pair count; marginals derive from the cell relation itself
 * (bounded by the category domains, never a second scan), and the
 * cell×marginal joins broadcast. A billion-row hot category costs one
 * cell row. The caller reads dof and Σ term_ppm against a critical
 * value; per-cell terms localize WHICH cell drives the dependence.
 */
object Contingency {

  /** Per-cell chi-square decomposition. Output: aCol, bCol, observed,
   * expected_milli (E·1000 truncated), term_ppm ((O−E)²/E in ppm,
   * truncated), dof (constant per row), n_total. Zero-frequency
   * marginals cannot occur (cells come from observed pairs). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val cells = df.groupBy(aCol, bCol).agg(count(lit(1)).as("observed"))
    val rowm = cells.groupBy(aCol).agg(sum("observed").as("row_total"))
    val colm = cells.groupBy(bCol).agg(sum("observed").as("col_total"))
    val tot = cells.agg(sum("observed").as("n_total"),
      countDistinct(aCol).as("na"), countDistinct(bCol).as("nb"))
    cells
      .join(broadcast(rowm), aCol)
      .join(broadcast(colm), bCol)
      .crossJoin(broadcast(tot))
      .select(col(aCol), col(bCol), col("observed"),
        col("row_total").cast(d38).as("r"),
        col("col_total").cast(d38).as("c"),
        col("n_total").cast(d38).as("t"),
        ((col("na") - 1) * (col("nb") - 1)).cast("long").as("dof"),
        col("n_total"))
      .withColumn("dev",
        col("observed").cast(d38) * col("t") - col("r") * col("c"))
      .select(col(aCol), col(bCol), col("observed"),
        expr("cast((r * c * 1000) div t as long)").as("expected_milli"),
        expr("cast((dev * dev * 1000000) div (t * r * c) as long)")
          .as("term_ppm"),
        col("dof"), col("n_total"))
  }
}
