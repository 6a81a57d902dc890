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
 * to `blockCols` (the standard fix) or pre-salt giant blocks the way
 * `Skew.saltedJoin` does.
 */
object Linkage {

  /** All in-block record pairs (id_a < id_b), carrying each side's
   * compare column. One self-join on the block key. */
  def candidatePairs(records: DataFrame, idCol: String, compareCol: String,
                     blockCols: Seq[String]): DataFrame = {
    val a = records.select(
      (col(idCol).as("id_a") +: col(compareCol).as(s"${compareCol}_a")
        +: blockCols.map(col)): _*)
    val b = records.select(
      (col(idCol).as("id_b") +: col(compareCol).as(s"${compareCol}_b")
        +: blockCols.map(col)): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
  }

  /** Linked pairs: in-block candidates whose compare-field edit
   * distance is ≤ maxDist. Returns (id_a, id_b, dist).
   *
   * Verify cost per pair is bounded twice: a length-gap guard (edit
   * distance is at least the length difference — an integer compare
   * that skips the DP entirely for most in-block pairs) and the
   * THRESHOLDED levenshtein, whose banded DP is O(len·maxDist) with
   * early exit instead of O(len²) — at web-scale blocks the verify is
   * the dominant term, so both bounds survive a 100× block growth. */
  def linkByEditDistance(records: DataFrame, idCol: String, compareCol: String,
                         blockCols: Seq[String], maxDist: Int): DataFrame =
    candidatePairs(records, idCol, compareCol, blockCols)
      .filter(abs(length(col(s"${compareCol}_a")) - length(col(s"${compareCol}_b")))
        <= maxDist)
      .withColumn("dist",
        levenshtein(col(s"${compareCol}_a"), col(s"${compareCol}_b"), maxDist)
          .cast("long"))
      // the thresholded variant returns -1 for "beyond maxDist"
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
}
