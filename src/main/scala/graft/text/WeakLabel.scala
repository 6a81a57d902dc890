package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based weak labeling (C59) — the keyword-list document
 * classifier every corpus pipeline runs before it has a trained one:
 * domain tagging (code/finance/medical), topic routing for mixture
 * weights (C36/C57 consume the labels), and policy screens all start
 * as "does any of these terms occur". Deterministic by construction —
 * no model state, no scores to drift — so labels are regression-
 * testable and engine-replayable.
 *
 * Scale shape: rules compile into the PLAN as a chain of codegen'd
 * substring probes over one lowercased copy of the text (no UDF, no
 * regex union blowup, no per-rule pass over the corpus — one
 * projection evaluates every rule), and the output is one row per doc:
 * embarrassingly parallel, shuffle-free. Rule order is the priority
 * order: `primary_label` is the FIRST matching rule, so adding a rule
 * at the end never reshuffles existing primaries.
 */
object WeakLabel {

  /** Append `labels` (ordered csv of every matching label),
   * `primary_label` (first match in rule order, else "unlabeled") and
   * `n_labels`. A rule matches when any of its keywords occurs
   * case-insensitively in textCol. */
  def label(
      df: DataFrame,
      textCol: String,
      rules: Seq[(String, Seq[String])]): DataFrame = {
    require(rules.nonEmpty, "weakLabel: no rules")
    val lowered = lower(coalesce(col(textCol), lit("")))
    def ruleHit(kws: Seq[String]): Column =
      kws.map(k => instr(lowered, k.toLowerCase) > 0).reduce(_ || _)
    val matched = filter(
      array(rules.map { case (lab, kws) =>
        when(ruleHit(kws), lit(lab)).otherwise(lit(null).cast("string"))
      }: _*),
      _.isNotNull)
    df.withColumn("labels", array_join(matched, ","))
      .withColumn("primary_label",
        coalesce(get(matched, lit(0)), lit("unlabeled")))
      .withColumn("n_labels", size(matched).cast("long"))
  }
}
