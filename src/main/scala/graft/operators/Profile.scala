package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-pass table profiler — the data-quality audit that gates a
 * corpus before training: per column, row count, non-null count,
 * exact distinct count, and min/max (rendered as strings so one long
 * schema fits every column type).
 *
 * All columns profile in a SINGLE aggregate over one scan; the
 * multi-column exact COUNT(DISTINCT) plans through Catalyst's Expand
 * (input replicated once per distinct column), which is the standard
 * cost of exactness — for a quick 100 TB screen where ±2% is fine,
 * `approxDistinct = true` swaps in `approx_count_distinct` (HLL++)
 * and the Expand disappears: one un-replicated pass, partial
 * aggregation fully map-side. The wide 1-row aggregate then unpivots
 * to long format with `stack` (narrow, no extra shuffle).
 */
object Profile {

  /** Long-format profile of `cols`: one row per column with
   * (col_name, n_rows, n_nonnull, n_distinct, min_str, max_str).
   * `approxDistinct = true` trades exact distinct counts for HLL++
   * estimates (±~2%) and removes the Expand replication — the dial
   * for a first screen of a 100 TB table. */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def nd(c: String) =
      if (approxDistinct) approx_count_distinct(col(c)) else count_distinct(col(c))
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c => Seq(
      count(col(c)).as(s"__nn_$c"),
      nd(c).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val stacked = cols
      .map(c => s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("`__n` as n_rows",
        s"stack(${cols.length}, $stacked) as (col_name, n_nonnull, n_distinct, min_str, max_str)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str")
  }

  /**
   * Order-independent table checksum over `cols`: one row of
   * (n_rows, checksum_sum, checksum_xor). Row hash = first 8 hex
   * chars of md5 over the ':'-joined string renderings (NULL → '') —
   * portable to any engine with md5, so a 100 TB copy/migration can
   * be validated with one aggregate per side and NO row transfer.
   * SUM and BIT_XOR are both reduction-order-independent; 32-bit row
   * hashes keep the sum far from Long overflow (2^31 rows of 2^32
   * values < 2^63). The ':' join means ("a:", "b") and ("a", ":b")
   * collide — acceptable for a checksum, documented here.
   */
  /** The row-hash column [[tableChecksum]] aggregates — ONE definition
   * (r20, VERDICT r19 #9), shared with Snapshot.replicate's ride-along
   * Observation so the two sides of a replica verify can never
   * silently diverge if the rendering ever changes. */
  def checksumColumn(cols: Seq[String]): org.apache.spark.sql.Column = {
    require(cols.nonEmpty, "need at least one column to checksum")
    val rendered = cols.map(c => coalesce(col(c).cast("string"), lit("")))
    conv(substring(md5(concat_ws(":", rendered: _*)), 1, 8), 16, 10)
      .cast("long")
  }

  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    df.select(checksumColumn(cols).as("h"))
      .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum_sum"),
        expr("bit_xor(h)").as("checksum_xor"))
  }

  /**
   * Snapshot diff: classify every key as `added` (new side only),
   * `removed` (old side only), `changed` (both sides, differing
   * rendered `compareCols`), or `unchanged` — the audit between two
   * versions of a corpus/table (yesterday's crawl vs today's, source
   * vs migrated copy) that [[tableChecksum]]'s single pass can only
   * flag, not localize. One full outer join on the key; each side
   * carries only (key, row-hash), so at 100 TB the shuffle is
   * key+8-byte rows, never the payload. Keys must be unique per side
   * (enforce upstream or pre-aggregate).
   *
   * Row hash (ADVICE r8 hardening): full 64-bit xxhash64 — not a
   * truncated 32-bit md5 prefix (a ~2^-32 collision classified a
   * changed row `unchanged`; 2^-64 is migration-audit grade) — over a
   * PREFIX-FREE field rendering: null → `N;`, value v →
   * `V<len>:<v>`. Length-prefixing makes the concatenation
   * unambiguous (":" inside values cannot shift field boundaries)
   * and null is distinct from the empty string (`N;` vs `V0:`).
   * Both sides hash inside the same query, so the engine-specific
   * xxhash64 is fine here; [[tableChecksum]] keeps portable md5 for
   * its cross-engine use.
   */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "need key and compare columns")
    def hashed(df: DataFrame, h: String): DataFrame = {
      val rendered = compareCols.map { c =>
        val s = col(c).cast("string")
        when(s.isNull, lit("N;"))
          .otherwise(concat(lit("V"), length(s).cast("string"), lit(":"), s))
      }
      df.select((keyCols.map(col) :+
        xxhash64(concat(rendered: _*)).as(h)): _*)
    }
    hashed(oldDf, "__h_old").join(hashed(newDf, "__h_new"), keyCols, "full_outer")
      .select((keyCols.map(col) :+
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("status")): _*)
  }

  /**
   * Functional-dependency / candidate-key audit — the dbt-style
   * `unique` / `relationships` tests at warehouse scale: does
   * `lhs → rhs` hold, and if not, how badly? One row:
   * (n_groups, n_violating, max_rhs_per_group). `rhs` empty checks
   * LHS UNIQUENESS instead (a candidate-key test: groups with more
   * than one ROW violate).
   *
   * Two-level aggregation, not COUNT(DISTINCT) inside groups: the
   * distinct (lhs, rhs) projection map-side-combines BEFORE its
   * shuffle, so a 10⁹-row group with 3 distinct rhs values ships 3
   * rows per partition, never the group. NULL rhs counts as a value
   * (an FD that maps some keys to NULL and others to a value is
   * violated — SQL DISTINCT semantics, identical in the oracle).
   */
  def fdViolations(df: DataFrame, lhs: Seq[String], rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty, "fdViolations needs at least one LHS column")
    val groups =
      if (rhs.isEmpty)
        df.groupBy(lhs.map(col): _*).agg(count(lit(1)).as("__m"))
      else
        df.select((lhs ++ rhs).map(col): _*).distinct()
          .groupBy(lhs.map(col): _*).agg(count(lit(1)).as("__m"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("__m") > 1, 1L).otherwise(0L)).as("n_violating"),
      max(col("__m")).as("max_rhs_per_group"))
  }
}
