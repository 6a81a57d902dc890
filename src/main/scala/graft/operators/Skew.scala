package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salting for skewed joins. AQE's skew-join handling
 * (spark.sql.adaptive.skewJoin.enabled) is the first line of defense
 * and needs no code; explicit salting is for the cases AQE can't fix —
 * e.g. a single hot key whose rows must still co-locate with a
 * broadcast-ineligible build side, or aggregations with one dominant
 * group.
 *
 * Shape: fan the build side out `saltFactor` times (one copy per salt
 * value), give each probe row a deterministic salt, join on
 * (key, salt) — the hot key's rows spread over `saltFactor` reducers.
 * Build-side volume multiplies by `saltFactor`, so use it on the
 * smaller side and keep the factor modest (8–32).
 */
object Skew {

  /**
   * Inner join `probe ⋈ build` on probeKey = buildKey with the hot
   * probe keys spread across `saltFactor` partitions. Result equals
   * the unsalted join (each probe row matches exactly the one build
   * replica carrying its salt).
   */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // right/full outer would emit unmatched build rows once per salt
    // replica — result would NOT equal the unsalted join
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports probe-preserving join types only, got '$joinType'")
    // deterministic per-row salt (stable across task retries — rand()
    // would break exactly-once semantics under speculative execution).
    // Position-based, not content-based: byte-identical duplicate rows
    // of a hot key (the common skew shape) must still spread, and a
    // content hash would map them all to one salt value.
    val salted = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val fanned = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted
      .join(fanned, salted("__salt") === fanned("__salt") &&
        salted(probeKey) === fanned(buildKey), joinType)
      .drop("__salt")
  }

  /**
   * Two-phase skew-safe aggregation: partial-aggregate on
   * (key, salt), then final-aggregate on key. Spark's hash aggregate
   * already does map-side partials, so this is only for non-algebraic
   * paths (e.g. collect_list of a hot key) — exposed for completeness.
   */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))
}
