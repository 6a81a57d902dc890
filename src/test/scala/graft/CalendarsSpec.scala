package graft

import graft.functions.Calendars
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.time.{DayOfWeek, LocalDate}

/** B101: the closed-form weekday arithmetic checked against the
  * brute-force java.time enumeration — every dow × lag combination,
  * weekend starts, the forward/inverse consistency law, and dates
  * before the 1900 anchor (negative day numbers). */
class CalendarsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def isWd(d: LocalDate): Boolean =
    d.getDayOfWeek.getValue <= DayOfWeek.FRIDAY.getValue

  /** Weekdays in (a, b] by enumeration. */
  private def bruteBd(a: LocalDate, b: LocalDate): Long =
    Iterator.iterate(a.plusDays(1))(_.plusDays(1))
      .takeWhile(!_.isAfter(b)).count(isWd).toLong

  /** k-th weekday strictly after d by enumeration. */
  private def bruteAdd(d: LocalDate, k: Int): LocalDate =
    Iterator.iterate(d.plusDays(1))(_.plusDays(1)).filter(isWd)
      .drop(k - 1).next()

  test("businessDaysBetween matches enumeration across every dow x lag") {
    // starts covering all 7 days of week, lags 0..30
    val pairs = for {
      s <- (0 until 7).map(LocalDate.of(2024, 3, 4).plusDays(_)) // Mon..Sun
      lag <- 0 to 30
    } yield (s.toString, s.plusDays(lag).toString)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Calendars.businessDaysBetween(to_date(col("a")), to_date(col("b")))
          .as("bd"))
      .as[(String, String, Long)].collect()
    got.foreach { case (a, b, bd) =>
      assert(bd == bruteBd(LocalDate.parse(a), LocalDate.parse(b)),
        s"bd($a, $b)")
    }
  }

  test("addBusinessDays matches enumeration and bd(d, add(d,k)) == k") {
    val starts = (0 until 7).map(LocalDate.of(2026, 8, 10).plusDays(_))
    // evaluate per-k since addBusinessDays takes a literal k
    for (k <- 1 to 15) {
      val rows = starts.map(_.toString).toDF("d")
        .select(col("d"),
          Calendars.addBusinessDays(to_date(col("d")), k).cast("string")
            .as("e"),
          Calendars.businessDaysBetween(
            to_date(col("d")),
            Calendars.addBusinessDays(to_date(col("d")), k)).as("bd"))
        .as[(String, String, Long)].collect()
      rows.foreach { case (d, e, bd) =>
        assert(LocalDate.parse(e) == bruteAdd(LocalDate.parse(d), k),
          s"add($d, $k)")
        assert(bd == k.toLong, s"inverse law at ($d, $k)")
        assert(isWd(LocalDate.parse(e)), s"add($d, $k) lands on a weekday")
      }
    }
  }

  test("dates before the 1900 anchor (negative day numbers) still floor correctly") {
    val pairs = Seq(
      ("1899-12-25", "1900-01-05"), // across the anchor
      ("1899-12-29", "1899-12-31"), // fully before, Fri -> Sun
      ("1899-12-23", "1899-12-24")) // Sat -> Sun, zero weekdays
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Calendars.businessDaysBetween(to_date(col("a")), to_date(col("b")))
          .as("bd"),
        Calendars.isBusinessDay(to_date(col("a"))).as("wd"))
      .as[(String, String, Long, Boolean)].collect()
    got.foreach { case (a, b, bd, wd) =>
      assert(bd == bruteBd(LocalDate.parse(a), LocalDate.parse(b)), s"($a,$b)")
      assert(wd == isWd(LocalDate.parse(a)), s"isBusinessDay($a)")
    }
  }
}
