package graft

import graft.operators.Allocation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Max-min fair allocation (C63): hand-checked boundaries plus the
  * fairness invariants on seeded random instances. */
class AllocationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def alloc(caps: Seq[(String, Long)], budget: Long) =
    Allocation.maxMinFair(
      caps.toDF("k", "cap"), "k", "cap",
      Seq(budget).toDF("budget"))

  test("progressive filling by hand: small caps grant fully, surplus splits") {
    // caps 1, 10, 10 with budget 12: cap 1 grants, remaining 11 over 2
    // -> base 5 rem 1 -> first uncapped in sort order gets 6
    val out = alloc(Seq(("a", 1L), ("b", 10L), ("c", 10L)), 12L)
      .select("k", "allocated", "capped").as[(String, Long, Boolean)]
      .collect().toSet
    assert(out == Set(("a", 1L, true), ("b", 6L, false), ("c", 5L, false)))
  }

  test("all-capped: every key gets its cap and shortfall reports the rest") {
    val out = alloc(Seq(("a", 3L), ("b", 4L)), 10L)
      .select("k", "allocated", "capped", "shortfall")
      .as[(String, Long, Boolean, Long)].collect().toSet
    assert(out == Set(("a", 3L, true, 3L), ("b", 4L, true, 3L)))
  }

  test("nobody capped: equal split with deterministic unit remainder") {
    val out = alloc(Seq(("a", 100L), ("b", 100L), ("c", 100L)), 11L)
      .select("k", "allocated").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 4L), ("b", 4L), ("c", 3L)))
  }

  test("fairness invariants hold on seeded random instances") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val caps = (0 until 50).map(i => (f"k$i%02d", 1L + rnd.nextInt(1000).toLong))
      val budget = 1L + rnd.nextInt(30000).toLong
      val rows = alloc(caps, budget)
        .select("k", "cap", "allocated", "capped")
        .as[(String, Long, Long, Boolean)].collect()
      val totCap = caps.map(_._2).sum
      // budget exhausted exactly (or the whole supply granted)
      assert(rows.map(_._3).sum == math.min(budget, totCap), s"trial $trial")
      // nobody exceeds their cap; capped keys get exactly their cap
      assert(rows.forall(r => r._3 <= r._2))
      assert(rows.filter(_._4).forall(r => r._3 == r._2))
      // max-min property: every capped key's grant is <= every
      // uncapped key's grant, and uncapped grants differ by <= 1
      val un = rows.filterNot(_._4).map(_._3)
      if (un.nonEmpty) {
        assert(un.max - un.min <= 1)
        assert(rows.filter(_._4).forall(_._3 <= un.min + 1))
      }
    }
  }

  test("partitioning invariance") {
    val caps = (0 until 40).map(i => (f"k$i%02d", (i * 37 % 11 + 1).toLong))
    val b = Seq(120L).toDF("budget")
    val a = Allocation.maxMinFair(caps.toDF("k", "cap"), "k", "cap", b)
      .collect().map(_.toString).toSet
    val c = Allocation.maxMinFair(
      caps.reverse.toDF("k", "cap").repartition(13), "k", "cap", b)
      .collect().map(_.toString).toSet
    assert(a == c)
  }

  test("proRata: exact total, leftover to largest remainders, key tie-break") {
    import spark.implicits._
    // budget 10 over weights 1,1,1 → bases 3,3,3, remainders equal →
    // leftover 1 goes to the SMALLEST key
    val b10 = spark.range(1).select(org.apache.spark.sql.functions.lit(10L).as("budget"))
    val eq = Allocation.proRata(Seq((5L, 1L), (2L, 1L), (9L, 1L)).toDF("k", "w"),
        "k", "w", b10)
      .select("k", "allocated").as[(Long, Long)].collect().toMap
    assert(eq == Map(2L -> 4L, 5L -> 3L, 9L -> 3L))
    // budget 100 over 1,2,3: bases 16,33,50 (sum 99), remainders
    // 4/6, 2/6, 0 → key 1 takes the leftover cent
    val b100 = spark.range(1).select(org.apache.spark.sql.functions.lit(100L).as("budget"))
    val got = Allocation.proRata(Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("k", "w"),
        "k", "w", b100)
      .select("k", "base", "extra", "allocated").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1).toList
    assert(got == List((1L, 16L, 1L, 17L), (2L, 33L, 0L, 33L), (3L, 50L, 0L, 50L)))
    assert(got.map(_._4).sum == 100L)
    // zero-weight keys participate (base 0) and the sum still lands
    val z = Allocation.proRata(Seq((1L, 0L), (2L, 7L)).toDF("k", "w"), "k", "w", b10)
      .select("k", "allocated").as[(Long, Long)].collect().toMap
    assert(z == Map(1L -> 0L, 2L -> 10L))
    // guards fail loudly
    intercept[IllegalArgumentException](Allocation.proRata(
      Seq((1L, 1L), (1L, 2L)).toDF("k", "w"), "k", "w", b10))
    intercept[IllegalArgumentException](Allocation.proRata(
      Seq((1L, -1L), (2L, 2L)).toDF("k", "w"), "k", "w", b10))
    intercept[IllegalArgumentException](Allocation.proRata(
      Seq((1L, 0L)).toDF("k", "w"), "k", "w", b10))
  }

  test("proRata: W past long range (ADVICE r14) and budget-shape guards") {
    import spark.implicits._
    // four near-max long weights: W = 4·(2^62+{0..3}) ≈ 2^64 > Long.Max,
    // so the remainder domain lives past long range — the decimal
    // split-rank path must still hand the leftover to the LARGEST
    // remainder (budget·w mod W grows with the weight here)
    val w0 = 1L << 62
    val big = Seq((1L, w0), (2L, w0 + 1L), (3L, w0 + 2L), (4L, w0 + 3L))
      .toDF("k", "w")
    val b7 = spark.range(1).select(org.apache.spark.sql.functions.lit(7L).as("budget"))
    val got = Allocation.proRata(big, "k", "w", b7)
      .select("k", "base", "extra", "allocated").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1).toList
    assert(got.map(_._4).sum == 7L, s"allocations must sum to the budget: $got")
    // bases are all 1 (7w_i/W ∈ (1,2)); remainders 7·w_i mod W order
    // by weight, so the 3 extras go to keys 4, 3, 2
    assert(got.map(r => (r._1, r._4)) ==
      List((1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L)), s"got $got")
    // budget must be exactly one non-negative row
    intercept[IllegalArgumentException](Allocation.proRata(
      Seq((1L, 1L)).toDF("k", "w"), "k", "w",
      Seq(5L, 6L).toDF("budget")))
    intercept[IllegalArgumentException](Allocation.proRata(
      Seq((1L, 1L)).toDF("k", "w"), "k", "w",
      Seq(-5L).toDF("budget")))
    intercept[IllegalArgumentException](Allocation.proRata(
      Seq((1L, 1L)).toDF("k", "w"), "k", "w",
      spark.range(1).select(org.apache.spark.sql.functions
        .lit(null).cast("long").as("budget"))))
  }
}
