package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Checksum-validated PII detection (C88) — the precision upgrade over
 * C15's pattern-only scrub: a bare 13–19-digit regex flags order
 * numbers, timestamps, and tracking ids as "card numbers", and at
 * corpus scale a false-positive redaction rate of even 1% destroys
 * real training text. Payment-card numbers carry their own integrity
 * check (the Luhn mod-10 checksum, ISO/IEC 7812), so candidates can
 * be VALIDATED, not just matched: only digit runs whose checksum
 * holds are treated as PANs and redacted; everything else is left
 * untouched and reported as a rejected candidate.
 *
 * Everything is built from native Spark expressions (regexp extract +
 * higher-order fold over ≤19 digits per candidate — bounded per-row
 * work that rides the scan; no UDF, no shuffle until the caller
 * aggregates), and the whole pipeline is engine-portable: the DuckDB
 * oracle replays extraction, checksum, and redaction on the same
 * text, so the validator's arithmetic is hash-checked cross-engine.
 */
object Pii {

  /** Digit runs that could be card numbers: maximal [0-9]+ runs of
   * length 13–19 (the PAN length envelope). Maximal-run extraction
   * (not lookarounds — RE2-safe, so DuckDB replays it verbatim) +
   * a length filter. */
  def panCandidates(text: Column): Column =
    filter(regexp_extract_all(text, lit("[0-9]+"), lit(0)),
      d => length(d) >= 13 && length(d) <= 19)

  /** Luhn mod-10 checksum over a digit-string column: from the
   * rightmost digit, double every second one (9-cap by subtracting 9),
   * valid iff the sum is divisible by 10. One bounded fold per value —
   * right-position parity expressed left-to-right as (len − i) odd. */
  def luhnValid(digits: Column): Column = {
    val total = aggregate(
      sequence(lit(1), length(digits)),
      lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        val doubled = d * 2
        acc + when((length(digits) - i) % 2 === 1,
          when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
      })
    total % 10 === 0
  }

  /** Per-document PAN audit + redaction: candidate digit runs, the
   * Luhn-valid subset, and the text with each VALID PAN replaced by
   * `<PAN>` (invalid candidates stay — they are data, not PII).
   * Output: (idCol, n_candidates, n_valid, valid_pans as a sorted
   * comma-joined string, redacted). Narrow per-row work only — the
   * caller decides what to aggregate. */
  def panAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = panCandidates(col(textCol))
    val valids = filter(cands, luhnValid(_))
    df.select(
      col(idCol),
      size(cands).cast("long").as("n_candidates"),
      size(valids).cast("long").as("n_valid"),
      concat_ws(",", array_sort(valids)).as("valid_pans"),
      aggregate(valids, col(textCol),
        (acc, p) => replace(acc, p, lit("<PAN>"))).as("redacted"))
  }
}
