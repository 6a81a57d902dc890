package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Policy-driven column masking (A28) — the release-side complement of
 * the k-anonymity audit (C65) and content PII redaction (C15): a
 * GOVERNANCE RELATION (column → action), not code, decides what each
 * column looks like in the released projection. Policies-as-data is
 * the point: the mask set is versioned, diffable, and auditable like
 * any other table, and the same policy row drives every release.
 *
 * Default-deny: a column the policy does not mention is DROPPED —
 * a schema evolution that adds a sensitive column cannot leak it
 * through a stale policy ("keep" must be said out loud). Unknown
 * policy columns and unknown actions fail loudly at plan time, never
 * silently no-op (the B73/B74 rule).
 *
 * Actions: `keep` | `null` (typed null — presence without value) |
 * `sha256` (stable pseudonym: equal values still join/group, the
 * linkability a hash deliberately retains — pair with C65 when the
 * hash itself is a quasi-identifier) | `prefix` (first `param` chars
 * + "***") | `bucket` (integral generalization to width-`param`
 * bands, C65's generalize move applied at release).
 *
 * Scale: the policy is column-count-sized metadata (collected once —
 * the one driver-side read is the governance dim, never data); the
 * masked projection compiles to ordinary codegen'd expressions riding
 * the scan, so masking 100 TB costs the scan.
 */
object Masking {

  /** `policy` rows: (column, action, param) — param read for
   * prefix/bucket, ignored otherwise. Output columns follow the
   * policy row order. */
  def applyPolicy(df: DataFrame, policy: DataFrame): DataFrame = {
    val rules = policy.select(
        col("column").cast("string"),
        col("action").cast("string"),
        col("param").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val present = df.columns.toSet
    val masked: Seq[Column] = rules.toSeq.map { case (name, action, param) =>
      require(present.contains(name),
        s"mask policy references absent column '$name'")
      val c = col(name)
      (action match {
        case "keep" => c
        case "null" => lit(null).cast(df.schema(name).dataType)
        case "sha256" => sha2(c.cast("string"), 256)
        case "prefix" =>
          require(param > 0, s"prefix mask on '$name' needs param > 0")
          concat(substring(c.cast("string"), 1, param.toInt), lit("***"))
        case "bucket" =>
          require(param > 0, s"bucket mask on '$name' needs param > 0")
          val t = df.schema(name).dataType.typeName
          require(Set("long", "integer", "short", "byte").contains(t),
            s"bucket mask on '$name' needs an integral column, got $t")
          expr(s"$name div ${param}L * ${param}L")
        case other => throw new IllegalArgumentException(
          s"mask policy: unknown action '$other' on column '$name'")
      }).as(name)
    }
    require(masked.nonEmpty, "mask policy is empty — nothing to release")
    df.select(masked: _*)
  }
}
