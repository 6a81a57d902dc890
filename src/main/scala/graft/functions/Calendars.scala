package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Business-day (weekday) calendar arithmetic as pure closed-form
 * integer expressions (B101) — the lead-time / SLA computation behind
 * every fulfilment dashboard ("how many working days from ship to
 * receipt", "was the order delivered within 10 business days").
 *
 * The textbook warehouse formulation joins every fact row against a
 * calendar dimension and COUNTS matching weekday rows — a per-row
 * range join that explodes each fact into its span (a 30-day lag costs
 * 30 rows) and shuffles fact-volume × span rows. Here the weekday
 * count is a CLOSED FORM over the day number, so the whole computation
 * is a handful of codegen'd integer ops riding the original scan — no
 * calendar table, no join, no explode, nothing data-sized beyond the
 * scan itself.
 *
 * Derivation: anchor day 0 at 1900-01-01, a Monday. For day number n
 * (datediff from the anchor), `f(n) = 5·⌊n/7⌋ + min(n mod 7 + 1, 5)`
 * counts the weekdays in [anchor, n] — full weeks contribute 5 each
 * and the partial week caps at Friday. Then
 *
 *   businessDaysBetween(a, b) = f(b) − f(a)       (weekdays in (a, b])
 *   addBusinessDays(d, k)     = f⁻¹(f(d) + k)
 *
 * where the inverse maps a weekday ordinal v back to its date:
 * `f⁻¹(v) = anchor + 7·⌊(v−1)/5⌋ + (v−1) mod 5`. Both directions are
 * total and mutually consistent: `businessDaysBetween(d, addBusinessDays
 * (d, k)) == k` for every date (weekend starts included — the k-th
 * weekday strictly after d needs no roll-forward convention).
 * Floor division/modulo are taken via `pmod` so the forms hold for
 * dates BEFORE the anchor too (negative n), not just after.
 *
 * All-integer: exact under any partitioning, replayable bit-for-bit.
 */
object Calendars {

  private val Anchor = "1900-01-01" // a Monday

  /** Days since the Monday anchor. */
  private def dayNum(d: Column): Column =
    datediff(d, to_date(lit(Anchor)))

  /** Floor quotient n/q computed from pmod so negatives floor too.
   * The numerator is exactly divisible by construction, so even though
   * Column `/` is double division the result is integral and exact
   * (day numbers are ≪ 2^53); the cast back to long is lossless. */
  private def floorDiv(n: Column, q: Int): Column =
    ((n - pmod(n, lit(q))) / q).cast("long")

  /** Count of weekdays (Mon–Fri) in [anchor, d]. */
  def weekdayOrdinal(d: Column): Column = {
    val n = dayNum(d)
    (floorDiv(n, 7) * 5 + least(pmod(n, lit(7)) + 1, lit(5))).cast("long")
  }

  /** Number of business days in the half-open interval (a, b] — the
   * working-day lag from a to b. Negative when b < a (anti-symmetric:
   * bd(a,b) = −bd(b,a) up to weekend endpoints sharing an ordinal). */
  def businessDaysBetween(a: Column, b: Column): Column =
    weekdayOrdinal(b) - weekdayOrdinal(a)

  /** The date of weekday ordinal v (inverse of [[weekdayOrdinal]]). */
  private def ordinalDate(v: Column): Column = {
    val v0 = v - 1
    date_add(to_date(lit(Anchor)),
      (floorDiv(v0, 5) * 7 + pmod(v0, lit(5))).cast("int"))
  }

  /** The k-th business day strictly after d: the unique weekday e with
   * businessDaysBetween(d, e) == k (k ≥ 1). k = 0 returns the latest
   * weekday ≤ d (d itself when d is a weekday). */
  def addBusinessDays(d: Column, k: Int): Column =
    ordinalDate(weekdayOrdinal(d) + k)

  /** True when d falls on Mon–Fri. */
  def isBusinessDay(d: Column): Column =
    pmod(dayNum(d), lit(7)) < 5
}
