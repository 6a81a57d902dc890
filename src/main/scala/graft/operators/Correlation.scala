package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact pairwise correlation matrix (B100) — Pearson r for every pair
 * of k integral measures, computed WITHOUT floats: `corr()` aggregates
 * doubles in reduction order (different partitionings give different
 * last bits — non-replayable), while the sufficient statistics
 * (n, Σx, Σx², Σxy) are exact integers under any order. The emitted
 * relation carries r's square in ppm plus its sign:
 *
 *   r²_ppm = 10⁶ · (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
 *
 * — a deterministic, engine-replayable statement of the same
 * information (r = sign·√(r²), and the caller can take the root in
 * whatever float width it likes AFTER the exact part is pinned).
 *
 * Scale: ONE map-side-combined aggregation over the fact table
 * computes all k + k(k−1)/2 sums in a single pass (no per-pair scan);
 * the pair relation is k²-bounded driver-side plan construction.
 *
 * Magnitude control: the raw identity squares nΣxy-sized quantities —
 * n²-growth that overflows even decimal(38,0) near 10⁶ rows of
 * large measures. So the quotient is taken on the n-NORMALIZED stats
 * (cov/n, varx/n, vary/n via truncating integral div — both engines
 * truncate identically, so the ppm stays bit-replayable; the
 * truncation perturbs r² by O(1/(cov/n)) — sub-ppm for any
 * non-degenerate data) and the squaring happens at n·cov-scale,
 * which decimal(38,0) carries past 10¹² rows. Zero-variance measures
 * yield NULL r² (division by zero → NULL in both engines), the
 * correct "undefined", not 0.
 */
object Correlation {

  /** One row per unordered measure pair: n, both sums, `r2_ppm` and
   * `r_sign` (−1/0/1 of the covariance). Measures must be integral
   * columns (scale/round upstream). */
  def pairwiseR2(df: DataFrame, measures: Seq[String]): DataFrame = {
    require(measures.size >= 2, "pairwiseR2 needs at least two measures")
    require(measures.distinct.size == measures.size, "duplicate measures")
    val dec = "decimal(38,0)"
    val sums =
      Seq(count(lit(1)).as("n")) ++
      measures.map(m => sum(col(m).cast(dec)).as(s"s_$m")) ++
      measures.map(m => sum((col(m) * col(m)).cast(dec)).as(s"q_$m")) ++
      measures.combinations(2).map { case Seq(a, b) =>
        sum((col(a) * col(b)).cast(dec)).as(s"p_${a}__$b")
      }.toSeq
    val one = df.agg(sums.head, sums.tail: _*)
    val pairRows = measures.combinations(2).map { case Seq(a, b) =>
      one.select(
        lit(a).as("measure_a"), lit(b).as("measure_b"), col("n"),
        col(s"s_$a").cast("long").as("sum_a"),
        col(s"s_$b").cast("long").as("sum_b"),
        expr(s"(cast(n as $dec) * `p_${a}__$b` - `s_$a` * `s_$b`) div n")
          .as("__cov"),
        expr(s"(cast(n as $dec) * `q_$a` - `s_$a` * `s_$a`) div n").as("__va"),
        expr(s"(cast(n as $dec) * `q_$b` - `s_$b` * `s_$b`) div n").as("__vb"))
    }.reduce(_ unionByName _)
    pairRows
      .withColumn("r2_ppm", expr(
        // nullif: ANSI decimal div-by-zero throws; zero variance must
        // read as NULL ("undefined"), not crash the whole matrix
        s"""cast(__cov as $dec) * __cov * 1000000
            div nullif(cast(__va as $dec) * __vb, cast(0 as $dec))"""))
      .withColumn("r_sign", signum(col("__cov")).cast("long"))
      .drop("__cov", "__va", "__vb")
  }
}
