package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-projection (Johnson–Lindenstrauss) embedding sketching
 * (C58) — reduce a d-dim embedding column to k dims while
 * approximately preserving pairwise distances (E[‖Px‖²] = k·‖x‖² for
 * a ±1 sign matrix), the standard pre-step that makes downstream ANN /
 * clustering / dedup O(k) per comparison instead of O(d).
 *
 * Scale shape: the ±1 matrix is a pure function of md5 — k·d signs
 * derived ONCE on the driver (1024 hashes for 16×64, the Ann-centroid
 * bounded-state precedent) and embedded in the plan as a reference
 * object, so the per-row work is an O(k·d) integer kernel inside
 * whole-stage codegen: no shuffle, no broadcast table, no per-row
 * hashing. Coordinates quantize to micro-units first, so projections
 * are EXACT integers — reduction-order-free, engine-replayable
 * (DuckDB reproduces every output value bit-for-bit from the same md5
 * parity), and safe to feed the exact-dedup/checksum operators that
 * float vectors would poison.
 *
 * The deterministic-seed form (hash parity, not an RNG) is what makes
 * the sketch INCREMENTAL at 100 TB: tomorrow's append projects with
 * the same matrix without persisting or re-broadcasting any state.
 */
object Projection {

  /** ±1 sign matrix (row-major k×dim) from md5 parity — the same
   * "first 8 hex chars of md5 as a number" derivation the engine's
   * hash-split uses, so any SQL engine replays it. */
  def signMatrix(k: Int, dim: Int): Array[Long] =
    Array.tabulate(k * dim) { idx =>
      val i = idx / dim
      val j = idx % dim
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl_${i}_$j".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map(b => f"$b%02x").mkString, 16)
      if (h % 2 == 0) 1L else -1L
    }

  /** Column of k exact micro-unit projections of a float/double
   * vector column. */
  def projectColumn(vec: Column, k: Int, dim: Int): Column =
    graft.functions.expressions.signedProjection(vec, signMatrix(k, dim), dim)

  /** Project `vecCol` to k dims as `outCol` (array<long> of micro-unit
   * coordinates). */
  def project(df: DataFrame, vecCol: String, outCol: String, k: Int, dim: Int): DataFrame =
    df.withColumn(outCol, projectColumn(col(vecCol), k, dim))
}
