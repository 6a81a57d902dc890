package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quotaSample keeps at most the quota per group, deterministically") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "grp")
    val s1 = Sampling.quotaSample(df, "grp", "id", 10).as[(Long, String)].collect().toSet
    val s2 = Sampling.quotaSample(df.repartition(7), "grp", "id", 10)
      .as[(Long, String)].collect().toSet
    assert(s1.groupBy(_._2).forall(_._2.size == 10))
    assert(s1 == s2, "sample must not depend on partitioning")
  }

  test("quotaSample keeps whole groups smaller than the quota") {
    val df = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "grp")
    assert(Sampling.quotaSample(df, "grp", "id", 10).count() == 2)
  }

  test("packSequences assigns chunks by cumulative token offset within a shard") {
    val df = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 300L), ("s1", 3L, 100L),
      ("s2", 4L, 600L), ("s2", 5L, 10L)).toDF("shard", "id", "toks")
    val got = Sampling.packSequences(df, "shard", "id", col("toks"), 512L)
      .select("id", "chunk_id", "chunk_off")
      .as[(Long, Long, Long)].collect().toSet
    // s1: doc1 at offset 0 → chunk 0; doc2 at 300 → chunk 0; doc3 at 600 → chunk 1 off 88
    // s2: independent shard — doc4 at 0 → chunk 0; doc5 at 600 → chunk 1 off 88
    assert(got == Set((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L),
      (4L, 0L, 0L), (5L, 1L, 88L)))
  }
}
