package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
   * Default probe-side salt: a content hash of the whole row. This is
   * DETERMINISTIC — a recomputed map task re-derives the same salt, so
   * a partial stage retry after a fetch failure cannot lose or
   * duplicate rows (the SPARK-23207 class of bug that rand() or
   * monotonically_increasing_id() salts reintroduce when the probe
   * side sits downstream of a shuffle). The tradeoff: byte-identical
   * duplicate rows of a hot key all hash to ONE salt value and do not
   * spread. When the probe table has a unique row id (or any
   * high-cardinality column set), pass it as `saltBy` to get both
   * determinism AND full spread of identical-payload rows.
   */
  private def saltExpr(df: DataFrame, saltBy: Seq[String], saltFactor: Int): Column = {
    val basis: Column =
      if (saltBy.nonEmpty) xxhash64(saltBy.map(col).toIndexedSeq: _*)
      else {
        // whole-row hash, restricted to hashable columns: MapType (at
        // any nesting depth) is rejected by Spark's hash expressions,
        // and a map column must not make the whole operator unusable
        def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
          case _: org.apache.spark.sql.types.MapType => false
          case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
          case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
          case _ => true
        }
        val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
        // all-map schema: degenerate but safe constant (no spread)
        if (cols.isEmpty) lit(0L) else xxhash64(struct(cols.toIndexedSeq: _*))
      }
    pmod(basis, lit(saltFactor.toLong))
  }

  /**
   * Inner join `probe ⋈ build` on probeKey = buildKey with the hot
   * probe keys spread across `saltFactor` partitions. Result equals
   * the unsalted join (each probe row matches exactly the one build
   * replica carrying its salt).
   *
   * `saltBy`: columns whose hash picks the salt bucket. Default (empty)
   * hashes the whole row — always deterministic, but byte-identical
   * duplicate rows share a bucket; pass a unique id column to spread
   * those too (see [[saltExpr]]).
   */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      saltFactor: Int,
      joinType: String = "inner",
      saltBy: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // right/full outer would emit unmatched build rows once per salt
    // replica — result would NOT equal the unsalted join
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports probe-preserving join types only, got '$joinType'")
    val salted = probe.withColumn("__salt", saltExpr(probe, saltBy, saltFactor))
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
   * Salt choice follows [[saltExpr]] (deterministic content hash by
   * default; pass `saltBy` for identical-row spread).
   */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int, saltBy: Seq[String] = Nil): DataFrame =
    df.withColumn("__salt", saltExpr(df, saltBy, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))

  /**
   * Hot-key-only salting: [[saltedJoin]] replicates the ENTIRE build
   * side `saltFactor` times — at 100 TB the fan-out of the 99.9% of
   * keys that were never skewed dominates the job. The production
   * shape detects the hot probe keys first (one map-side-combined
   * count whose shuffle carries distinct keys, the JoinDiag
   * preflight run inline), broadcasts the bounded hot set, and
   * splits: hot slices join salted, cold slices join plain, results
   * union. Build replication is then `saltFactor` × hot-key rows
   * only.
   *
   * `hotThreshold` is the probe-row count above which a key salts —
   * set it high enough that the hot set is broadcast-small (it is,
   * by construction: at most |probe| / hotThreshold keys qualify).
   * Probe-preserving join types only, as in [[saltedJoin]]; the
   * hot/cold split partitions BOTH sides consistently, so the union
   * equals the unsalted join row-for-row.
   */
  def adaptiveSaltedJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      saltFactor: Int,
      hotThreshold: Long,
      joinType: String = "inner",
      saltBy: Seq[String] = Nil): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    // the hot and cold slices union after their joins — duplicate
    // column names across the two sides would make that union
    // ambiguous (COLUMN_ALREADY_EXISTS at analysis)
    require(probe.columns.toSet.intersect(build.columns.toSet).isEmpty,
      "adaptiveSaltedJoin: alias probe/build columns apart first")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"adaptiveSaltedJoin supports probe-preserving keyed join types only, got '$joinType'")
    val hot = probe.groupBy(col(probeKey)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(col(probeKey).as("__hk"))
    def split(df: DataFrame, key: String): (DataFrame, DataFrame) = (
      df.join(broadcast(hot), df(key) === col("__hk"), "left_semi"),
      df.join(broadcast(hot), df(key) === col("__hk"), "left_anti"))
    val (pHot, pCold) = split(probe, probeKey)
    val (bHot, bCold) = split(build, buildKey)
    saltedJoin(pHot, bHot, probeKey, buildKey, saltFactor, joinType, saltBy)
      .unionByName(pCold.join(bCold, pCold(probeKey) === bCold(buildKey), joinType))
  }
}
