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

  /** Edit-distance-1 linkage via DELETION NEIGHBORHOODS (C32b, r18 —
   * the FastSS scheme, Bocek et al. 2007): each record emits its
   * compare string plus every single-deletion variant as blocking
   * keys; two strings are within edit distance 1 IFF their key sets
   * intersect, so the key equi-join is a COMPLETE candidate
   * generator and the exact thresholded-levenshtein verify only
   * confirms. This is the SCALE-CORRECT shape for dist-1 linkage:
   * candidate volume tracks true near-duplicate density (key groups
   * stay small wherever strings are distinctive), where fixed-
   * cardinality blocking ([[linkByEditDistance]] on a handful of
   * categorical columns) pays block-size² — the r18 sf10 probe
   * measured that as 86× runtime for 10× data. Keep the blocked
   * variant for arbitrary maxDist with a discriminating key; use
   * this one whenever maxDist = 1 and no such key exists.
   *
   * NULL compare strings link to nothing (a name-less record has no
   * evidence). Returns (id_a, id_b, dist), id_a < id_b, global —
   * not confined to any block.
   *
   * Mass-duplication collapse (the §4 rule, measured on the sf10
   * probe): the neighborhood join runs over DISTINCT strings only —
   * k records sharing one string would otherwise push every one of
   * their ~len+1 shared keys through the self-join as k² candidate
   * rows PER KEY (1.4B candidates at 100× duplication, an OOM).
   * Distinct-string pairs at distance 1 expand back to record pairs
   * through two string-keyed joins, and equal-string record pairs
   * (dist 0) come from one same-string self-join — both produce
   * output-sized small rows only. The key self-join is pinned to
   * sort-merge: the explode multiplies rows ~len+1 past the source's
   * size stats, and Catalyst otherwise BROADCASTS a side that is
   * actually GBs (watched at 3.3 GiB into an 8 GiB JVM). */
  def linkByDeletion1(records: DataFrame, idCol: String,
      compareCol: String): DataFrame = {
    val base = graft.dedup.Dedup.spread(records)
      .filter(col(compareCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(compareCol).as("s"))
    val names = base.select(col("s")).distinct()
    val keys = names
      .select(col("s"), explode(graft.functions.expressions
        .deletionNeighborhood(col("s"))).as("k"))
      .hint("shuffle_merge")
    // distinct name pairs at exactly distance 1 (equal names never
    // meet here — the neighborhoods are keyed per DISTINCT string)
    val namePairs = keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
      .distinct() // a pair can share several keys
      .filter(levenshtein(col("s1"), col("s2"), 1) === 1)
    // equal-string record pairs: dist 0
    val within = base.as("x").join(base.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(0L).as("dist"))
    // distance-1 name pairs expand to every record pair across them
    val cross = namePairs
      .join(base.select(col("s").as("s1"), col("id").as("id_x")), "s1")
      .join(base.select(col("s").as("s2"), col("id").as("id_y")), "s2")
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"), lit(1L).as("dist"))
    within.unionByName(cross)
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
