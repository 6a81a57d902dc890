package graft

import graft.operators.Anonymity
import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity audit (C65): boundary and NULL-class semantics. */
class AnonymitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("a", Option(1L)), ("a", Option(1L)), ("a", Option(1L)), // size 3: passes k=3
    ("b", Option(2L)), ("b", Option(2L)),                    // size 2: violates
    ("c", Option.empty[Long]), ("c", Option.empty[Long]),    // NULL is a QI value
    ("d", Option(9L))                                        // singleton
  ).toDF("seg", "band")

  test("violations: exactly the classes under k, null classes included") {
    val got = Anonymity.kAnonymityViolations(df, Seq("seg", "band"), 3L)
      .as[(String, Option[Long], Long)].collect().toSet
    assert(got == Set(
      ("b", Some(2L), 2L), ("c", None, 2L), ("d", Some(9L), 1L)))
  }

  test("summary: counts, risk ppm, anonymity level, satisfies flag") {
    val r = Anonymity.kAnonymitySummary(df, Seq("seg", "band"), 3L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].head()
    // 4 classes, 8 rows, 3 violating classes, 5 rows at risk,
    // min class 1, 625000 ppm, not satisfied
    assert(r == ((4L, 8L, 3L, 5L, 1L, 625000L, false)))
    val ok = Anonymity.kAnonymitySummary(df, Seq("seg", "band"), 2L)
      .select("satisfies_k").as[Boolean].head()
    assert(!ok) // the singleton still violates k=2
  }

  test("refuses empty QI lists and k < 2") {
    intercept[IllegalArgumentException](
      Anonymity.kAnonymityViolations(df, Nil, 3L))
    intercept[IllegalArgumentException](
      Anonymity.kAnonymitySummary(df, Seq("seg"), 1L))
  }

  test("partitioning invariance") {
    val rows = (0 until 1000).map(i => (s"s${i % 13}", Option((i % 29).toLong)))
    val a = Anonymity.kAnonymitySummary(rows.toDF("seg", "band"),
      Seq("seg", "band"), 4L).collect().map(_.toString).toSet
    val b = Anonymity.kAnonymitySummary(
      rows.reverse.toDF("seg", "band").repartition(11),
      Seq("seg", "band"), 4L).collect().map(_.toString).toSet
    assert(a == b)
  }
}
