package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Record linkage / entity resolution over STRUCTURED records — the
 * multi-field cousin of the text dedup family (`graft.dedup`): find
 * likely-same-entity record pairs without comparing all pairs.
 *
 * Classic two-stage shape, same scale rule as MinHash/LSH dedup:
 *  1. BLOCK: records shuffle once on cheap blocking keys (region +
 *     segment, zip prefix, phonetic code…) — candidate pairs exist
 *     only WITHIN a block, so the quadratic explosion is bounded by
 *     the largest block, never the corpus;
 *  2. VERIFY: an exact field-similarity predicate (here codegen'd
 *     `levenshtein`, portable to any engine) runs only on in-block
 *     pairs, `id_a < id_b` deduping the symmetric pair.
 *
 * Skewed blocks are the caller's lever: add a discriminating column
 * to `blockCols` (the standard fix) or pre-salt giant blocks via
 * `salts > 1` (the `Skew.saltedJoin` pattern, built in below).
 */
object Linkage {

  /** All in-block record pairs (id_a < id_b), carrying each side's
   * compare column. One self-join on the block key.
   *
   * `salts > 1` pre-salts the self-join for skewed block-key
   * distributions (one giant block otherwise lands every candidate
   * pair on ONE reducer): the a-side gets a deterministic salt from
   * its id, the b-side replicates to every salt, and the join key
   * grows the salt column — each unordered pair still joins exactly
   * once (at the a-side's salt), so the pair SET is identical to the
   * unsalted join while the giant block's verify work spreads across
   * `salts` reducers. Cost: the b-side shuffle replicates ×salts —
   * worth it exactly when one block dominates (ScaleProbe measures
   * the 50%-giant-block shape). */
  def candidatePairs(records: DataFrame, idCol: String, compareCol: String,
                     blockCols: Seq[String], salts: Int = 1): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // Spread the probe side before the CPU-heavy verify (the
    // Dedup.spread rationale): when the build side broadcasts — the
    // common small-records case — the join inherits the probe side's
    // partitioning, and a few-file input would run the whole
    // quadratic verify in one task. A many-partition input (the
    // 100 TB case) passes through untouched.
    val a = graft.dedup.Dedup.spread(records).select(
      (col(idCol).as("id_a") +: col(compareCol).as(s"${compareCol}_a")
        +: blockCols.map(col)): _*)
    val b = records.select(
      (col(idCol).as("id_b") +: col(compareCol).as(s"${compareCol}_b")
        +: blockCols.map(col)): _*)
    if (salts == 1) {
      a.join(b, blockCols).filter(col("id_a") < col("id_b"))
    } else {
      val sa = a.withColumn("__salt", pmod(xxhash64(col("id_a")), lit(salts.toLong)))
      val sb = b.withColumn("__salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1))))
      sa.join(sb, blockCols :+ "__salt")
        .filter(col("id_a") < col("id_b"))
        .drop("__salt")
    }
  }

  /** Linked pairs: in-block candidates whose compare-field edit
   * distance is ≤ maxDist. Returns (id_a, id_b, dist).
   *
   * Verify cost per pair is bounded twice: a length-gap guard (edit
   * distance is at least the length difference — an integer compare
   * that skips the DP entirely for most in-block pairs) and the
   * THRESHOLDED levenshtein, whose banded DP is O(len·maxDist) with
   * early exit instead of O(len²) — at web-scale blocks the verify is
   * the dominant term, so both bounds survive a 100× block growth.
   * `salts` spreads a skewed block's verify (see [[candidatePairs]]);
   * the linked pair set is salt-invariant. */
  def linkByEditDistance(records: DataFrame, idCol: String, compareCol: String,
                         blockCols: Seq[String], maxDist: Int,
                         salts: Int = 1): DataFrame =
    candidatePairs(records, idCol, compareCol, blockCols, salts)
      .filter(abs(length(col(s"${compareCol}_a")) - length(col(s"${compareCol}_b")))
        <= maxDist)
      .withColumn("dist",
        levenshtein(col(s"${compareCol}_a"), col(s"${compareCol}_b"), maxDist)
          .cast("long"))
      // the thresholded variant returns -1 for "beyond maxDist"
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
}
