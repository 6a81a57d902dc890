package graft

import graft.operators.Rank
import org.scalatest.funsuite.AnyFunSuite

class RankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distinctRanks matches a serial sort, duplicates collapse") {
    val vals = Seq(30L, 10L, 20L, 10L, 40L, 30L).toDF("x")
    val got = Rank.distinctRanks(vals, "x").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 20L -> 2L, 30L -> 3L, 40L -> 4L))
  }

  test("distinctRanks is exact across many range partitions") {
    // 10_000 shuffled values over 32 range partitions: rank must be
    // the value's position in the global sorted order regardless of
    // where the sampled range boundaries fall
    val n = 10000
    val vals = scala.util.Random.shuffle((1 to n).toList)
      .map(i => i.toLong * 7L).toDF("x").repartition(16)
    val got = Rank.distinctRanks(vals, "x", partitions = 32)
      .as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall { case (v, r) => v == r * 7L })
  }

  test("everyKthDistinct returns the k-th, 2k-th, ... values ascending") {
    val vals = (1L to 250L).toDF("x")
    val got = Rank.everyKthDistinct(vals, "x", k = 100).as[Long].collect().toSeq
    assert(got == Seq(100L, 200L))
    // fewer distinct values than k: empty break set, not a crash
    val small = (1L to 5L).toDF("x")
    assert(Rank.everyKthDistinct(small, "x", k = 100).count() == 0L)
  }

  test("distinctRanks equals a serial sort on random duplicate-heavy data, negatives included") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(5000)(rnd.nextInt(800).toLong - 400L)
    val want = vals.distinct.sorted.zipWithIndex
      .map { case (v, i) => (v, (i + 1).toLong) }.toMap
    val got = Rank.distinctRanks(vals.toDF("x"), "x")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("distinctRanks ignores nulls and handles a single partition") {
    val vals = Seq(Some(5L), None, Some(3L), Some(5L)).toDF("x")
    val got = Rank.distinctRanks(vals, "x", partitions = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 5L -> 2L))
  }
}
