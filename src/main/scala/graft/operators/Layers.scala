package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Layered interval resolution (B98) — N overlapping validity
 * intervals per key, each carrying a priority and a value; the answer
 * is the EFFECTIVE piecewise timeline: minimal [start, end) segments
 * with the highest-priority covering value at every instant.
 * Feature-flag / pricing-rule / config-layer resolution ("the
 * campaign price overrides the seasonal price overrides the base
 * price — what price was actually in force, when?").
 *
 * Plan, all keyed exchanges:
 *  1. boundaries: each key's distinct interval endpoints, sorted once;
 *     consecutive pairs are the candidate segments (≤ 2·intervals);
 *  2. covering join: segment → intervals with vf ≤ s < vt, ridden on
 *     [[Ranged.bandedJoin]] over (key, segment-start vs vf) with band
 *     = the longest interval (covering implies s − vf < len), never a
 *     per-key nested loop;
 *  3. winner per segment: ONE max_by struct aggregate — (prio, tie)
 *     lexicographic, deterministic;
 *  4. minimal output: adjacent segments won by the SAME interval
 *     merge via the islands flag+cumsum trick (uncovered gaps break
 *     runs, so a rule that lapses and resumes yields two segments).
 *
 * Uncovered instants produce NO row (absence is visible as a gap in
 * the timeline, not an invented default). All-integer, replayable.
 */
object Layers {

  /**
   * `df`: key, integral `vf`/`vt` (half-open, vt > vf rows only —
   * others dropped), integral `prio` (higher wins), `tie` (total
   * order within equal priority — e.g. a rule id; higher wins), and
   * `value`. Output per key: `seg_start`, `seg_end`, `prio`, `tie`,
   * `value` of the winning layer, minimal segments.
   */
  def effectiveIntervals(df: DataFrame, key: String, vf: String, vt: String,
      prio: String, tie: String, value: String): DataFrame = {
    val iv = df.filter(col(vt) > col(vf))
    // 1. candidate segments from sorted distinct boundaries
    val bounds = iv.select(col(key).as("__k"), col(vf).as("__p"))
      .unionByName(iv.select(col(key).as("__k"), col(vt).as("__p")))
      .distinct()
    val wb = Window.partitionBy("__k").orderBy("__p")
    val segs = bounds
      .withColumn("__e", lead(col("__p"), 1).over(wb))
      .filter(col("__e").isNotNull)
      .select(col("__k"), col("__p").as("__s"), col("__e"))
    // 2. covering intervals via the banded equi-join
    val ivTagged = iv.select(col(key).as("__ik"), col(vf).as("__ivf"),
      col(vt).as("__ivt"), col(prio).as("__iprio"), col(tie).as("__itie"),
      col(value).as("__ival"))
    val bandRow = iv.agg(max(col(vt) - col(vf))).head()
    val band = if (bandRow.isNullAt(0)) 1L else math.max(1L, bandRow.getLong(0))
    val covered = Ranged.bandedJoin(segs, ivTagged, "__k", "__ik", "__s", "__ivf", band)
      .filter(col("__ivf") <= col("__s") && col("__s") < col("__ivt"))
    // 3. deterministic winner: lexicographic (prio, tie)
    val won = covered
      .groupBy(col("__k"), col("__s"), col("__e"))
      .agg(max(struct(col("__iprio"), col("__itie"), col("__ivf"),
        col("__ival"))).as("__w"))
      .select(col("__k"), col("__s"), col("__e"),
        col("__w.__iprio").as("__wprio"), col("__w.__itie").as("__wtie"),
        col("__w.__ivf").as("__wvf"), col("__w.__ival").as("__wval"))
    // 4. merge adjacent segments won by the same layer instance
    val ws = Window.partitionBy("__k").orderBy("__s")
    won
      .withColumn("__newrun",
        (lag(col("__e"), 1).over(ws).isNull ||
          lag(col("__e"), 1).over(ws) =!= col("__s") ||
          lag(col("__wtie"), 1).over(ws) =!= col("__wtie") ||
          lag(col("__wprio"), 1).over(ws) =!= col("__wprio") ||
          lag(col("__wvf"), 1).over(ws) =!= col("__wvf")).cast("long"))
      .withColumn("__run",
        sum(col("__newrun")).over(ws.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("__k").as(key), col("__run"))
      .agg(min("__s").as("seg_start"), max("__e").as("seg_end"),
        max("__wprio").as(prio), max("__wtie").as(tie),
        max("__wval").as(value))
      .drop("__run")
  }
}
