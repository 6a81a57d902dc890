package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private lazy val facts = ((1 to 900).map(i => (1L, s"hot$i")) ++
    (1 to 100).map(i => (i.toLong % 7 + 2, s"cold$i"))).toDF("k", "payload")
  private lazy val dims = (1L to 9L).map(i => (i, s"dim$i")).toDF("dk", "label")

  test("saltedJoin equals the unsalted join") {
    val plain = facts.join(dims, $"k" === $"dk").select("k", "payload", "label")
    val salted = Skew.saltedJoin(facts, dims, "k", "dk", saltFactor = 8)
      .select("k", "payload", "label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin spreads the hot key across salt buckets") {
    val salted = facts.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    val buckets = salted.filter($"k" === 1L).groupBy("__salt").count().count()
    assert(buckets >= 6, s"hot key should land in most of the 8 salt buckets, got $buckets")
  }

  test("byte-identical duplicate rows of a hot key still spread") {
    // the common real skew shape: the hot key's rows are IDENTICAL, so a
    // content-derived salt would collapse them onto one reducer
    val dupFacts = (1 to 800).map(_ => (1L, "same")).toDF("k", "payload")
    val salted = dupFacts.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    val buckets = salted.groupBy("__salt").count().count()
    assert(buckets >= 6, s"identical hot rows should spread over salt buckets, got $buckets")
    // and the join result is still exact
    val plain = dupFacts.join(dims, $"k" === $"dk").select("k", "payload", "label")
    val viaOp = Skew.saltedJoin(dupFacts, dims, "k", "dk", saltFactor = 8)
      .select("k", "payload", "label")
    assert(viaOp.count() == plain.count())
  }

  test("saltedCount matches plain counts") {
    val plain = facts.groupBy("k").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(facts, "k", 8)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
