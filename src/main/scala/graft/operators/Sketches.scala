package graft.operators

import graft.functions.expressions.cmsEstimate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable frequency sketches for corpus-scale profiling.
 *
 * A Count-Min sketch answers "how often does this key occur across
 * 100 TB?" from a few-hundred-KB array built in ONE map-side-partial
 * pass: each partition sketches locally, merge adds the counter
 * arrays, and only depth×width longs per partition ever move — no
 * per-key shuffle, no driver-side key set. The estimate is biased
 * high only (est ≥ true always; est ≤ true + eps·N with the sketch's
 * confidence), which is the safe direction for the typical uses:
 * over-represented-document filtering, hot-key (skew) detection
 * before a join, and vocabulary heavy-hitter screens where a false
 * positive merely costs an exact re-check.
 *
 * Build uses Spark's own `count_min_sketch` aggregate (codegen'd,
 * partial-merge); probe is graft's codegen'd [[graft.functions
 * .CmsEstimate]] expression, so both halves stay in whole-stage
 * codegen with the sketch riding the plan as a reference object.
 */
object Sketches {

  /** Serialized Count-Min sketch over `keyCol` (integral or string).
   * One scan of `df`; the result is a plan-embeddable literal. An
   * empty input yields a real all-zero sketch (estimates 0), not the
   * aggregate's NULL. */
  def buildCms(df: DataFrame, keyCol: String,
      eps: Double = 0.005, confidence: Double = 0.99, seed: Int = 42): Array[Byte] = {
    val row = df
      .select(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)).as("cms"))
      .head()
    if (row.isNullAt(0)) {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed).writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd per-row frequency estimate against a [[buildCms]]
   * sketch. est ≥ true count always; est ≤ true + eps·N w.h.p. */
  def estimate(sketch: Array[Byte], key: Column): Column = cmsEstimate(key, sketch)
}
