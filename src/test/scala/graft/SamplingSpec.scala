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

  test("stratifiedSample hits each stratum's fraction and is partition-independent") {
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) "big" else "small")).toDF("id", "grp")
    val kept = Sampling.stratifiedSample(df, "grp", "id", Map("big" -> 0.5, "small" -> 0.1))
      .as[(Long, String)].collect().toSet
    val again = Sampling.stratifiedSample(df.repartition(13), "grp", "id",
      Map("big" -> 0.5, "small" -> 0.1)).as[(Long, String)].collect().toSet
    assert(kept == again, "sample must not depend on partitioning")
    val byGrp = kept.groupBy(_._2).view.mapValues(_.size).toMap
    // 2000 per stratum; md5 buckets are uniform → binomial, ±5σ bounds
    assert(byGrp("big") > 880 && byGrp("big") < 1120, s"big kept ${byGrp("big")}, want ~1000")
    assert(byGrp("small") > 40 && byGrp("small") < 170, s"small kept ${byGrp("small")}, want ~200")
  }

  test("mixtureResample: rate>1 replicates, fractional part draws, rate 0 drops") {
    val df = (1L to 3000L).map(i =>
      (i, Seq("up", "down", "keep")(i.toInt % 3))).toDF("id", "grp")
    val out = Sampling.mixtureResample(df, "grp", "id",
        Map("up" -> 2.5, "down" -> 0.25, "keep" -> 1.0))
      .select("id", "grp", "copy_idx").as[(Long, String, Int)].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.length).toMap
    // 1000 rows per stratum: up → 2000 guaranteed + Binomial(1000, .5);
    // keep → exactly 1000; down → Binomial(1000, .25); ±5σ bounds
    assert(byGrp("keep") == 1000, s"rate 1.0 must keep exactly one copy: ${byGrp("keep")}")
    assert(byGrp("up") > 2420 && byGrp("up") < 2580, s"up ~2500, got ${byGrp("up")}")
    assert(byGrp("down") > 180 && byGrp("down") < 320, s"down ~250, got ${byGrp("down")}")
    // every up-row has BOTH guaranteed copies (0 and 1)
    val upCopies = out.filter(_._2 == "up").groupBy(_._1).view.mapValues(_.length)
    assert(upCopies.values.forall(n => n == 2 || n == 3))
    // rate 0 via default: unlisted strata vanish entirely
    val dropped = Sampling.mixtureResample(df, "grp", "id", Map("up" -> 1.0), default = 0.0)
    assert(dropped.filter(col("grp") =!= "up").count() == 0)
    // partition-independent (the determinism contract)
    val again = Sampling.mixtureResample(df.repartition(11), "grp", "id",
        Map("up" -> 2.5, "down" -> 0.25, "keep" -> 1.0))
      .select("id", "grp", "copy_idx").as[(Long, String, Int)].collect()
    assert(out.toSet == again.toSet, "resample must not depend on partitioning")
  }

  test("stratifiedSample: fraction 0 drops a stratum; unlisted strata use the default") {
    val df = (1L to 300L).map(i => (i, Seq("a", "b", "c")(i.toInt % 3))).toDF("id", "grp")
    val kept = Sampling.stratifiedSample(df, "grp", "id", Map("a" -> 0.0), default = 1.0)
      .as[(Long, String)].collect().toSeq
    assert(!kept.exists(_._2 == "a"), "fraction-0 stratum must vanish")
    assert(kept.count(_._2 == "b") == 100 && kept.count(_._2 == "c") == 100,
      "default 1.0 must keep unlisted strata whole")
  }

  test("weightedSample: k per group, weight-monotone inclusion, partition-independent") {
    // two groups of 500; weights heavily skewed: ids ending in 0 get
    // weight 1000, the rest weight 1 — the heavy tenth should dominate
    val df = (1L to 1000L).map(i =>
      (i, if (i <= 500) "g1" else "g2", if (i % 10 == 0) 1000L else 1L)).toDF("id", "grp", "w")
    val s1 = Sampling.weightedSample(df, "grp", "id", col("w"), 50)
      .as[(Long, String, Long)].collect().toSet
    val s2 = Sampling.weightedSample(df.repartition(7), "grp", "id", col("w"), 50)
      .as[(Long, String, Long)].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    assert(s1.groupBy(_._2).forall(_._2.size == 50), "exactly k per group")
    // 50 heavy rows per group at 1000x weight vs 450 light: essentially
    // all heavies selected (each light row's priority is ~1000x larger)
    val heavy = s1.count(_._3 == 1000L)
    assert(heavy > 90, s"weight-1000 rows must dominate the sample: $heavy/100")
    // zero/negative weights never sampled, even when the group has room
    val z = Sampling.weightedSample(
      Seq((1L, "g", 5L), (2L, "g", 0L), (3L, "g", -4L)).toDF("id", "grp", "w"),
      "grp", "id", col("w"), 10).as[(Long, String, Long)].collect().toSet
    assert(z == Set((1L, "g", 5L)), s"w<=0 must be excluded: $z")
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

  test("materializePack concatenates each chunk's documents in id order") {
    val df = Seq(
      ("s1", 2L, "beta", 300L), ("s1", 1L, "alpha", 300L), ("s1", 3L, "gamma", 100L),
      ("s2", 4L, "delta", 600L)).toDF("shard", "id", "txt", "toks")
    val got = Sampling.materializePack(df, "shard", "id", "txt", col("toks"), 512L)
      .select("shard", "chunk_id", "n_docs", "chunk_tok", "chunk_text")
      .as[(String, Long, Long, Long, String)].collect().toSet
    // s1 chunk 0 = docs 1+2 (ids sorted, not input order); chunk 1 = doc 3
    assert(got == Set(
      ("s1", 0L, 2L, 600L, "alpha beta"),
      ("s1", 1L, 1L, 100L, "gamma"),
      ("s2", 0L, 1L, 600L, "delta")))
  }

  test("budgetMaterialize: exact multiples give uniform epochs; remainders prefix-fill") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(("s", 1L, 4L), ("s", 2L, 3L), ("s", 3L, 3L)).toDF("source", "doc_id", "toks")
    // alloc = 2n exactly: every doc gets exactly 2 copies, no partial
    val even = graft.operators.Sampling.budgetMaterialize(docs, "source", "doc_id",
      "toks", Seq(("s", 20L)).toDF("source", "allocated"))
    assert(even.select("copies").as[Long].collect().toList == List(2L, 2L, 2L))
    // alloc = 23 = 2n + 3: a 3-token prefix fits exactly one more doc...
    // unless md5 order puts the 4-token doc first (then nothing fits).
    val odd = graft.operators.Sampling.budgetMaterialize(docs, "source", "doc_id",
      "toks", Seq(("s", 23L)).toDF("source", "allocated"))
      .select("doc_id", "toks", "copies").as[(Long, Long, Long)].collect()
    assert(odd.forall(r => r._3 == 2L || r._3 == 3L))
    val mat = odd.map(r => r._2 * r._3).sum
    assert(mat <= 23L && 23L - mat < 4L + 1L)
    // determinism across partitioning
    val again = graft.operators.Sampling.budgetMaterialize(
        docs.repartition(7), "source", "doc_id", "toks",
        Seq(("s", 23L)).toDF("source", "allocated"))
      .select("doc_id", "copies").as[(Long, Long)].collect().toSet
    assert(again == odd.map(r => (r._1, r._3)).toSet)
  }

  test("budgetMaterialize: zero full epochs when alloc < n; per-source isolation") {
    import spark.implicits._
    val docs = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 3L, 5L))
      .toDF("source", "doc_id", "toks")
    val alloc = Seq(("a", 10L), ("b", 15L)).toDF("source", "allocated")
    val got = graft.operators.Sampling.budgetMaterialize(docs, "source", "doc_id",
        "toks", alloc)
      .select("source", "doc_id", "copies").as[(String, Long, Long)]
      .collect().toSet
    // a: one of the two docs selected once (md5 prefix), other 0; b: 3 copies
    val aCopies = got.filter(_._1 == "a").map(_._3).toList.sorted
    assert(aCopies == List(0L, 1L))
    assert(got.filter(_._1 == "b").map(_._3) == Set(3L))
  }

  test("shardAssign stripes in (size desc, id) order and bounds mass skew") {
    import spark.implicits._
    // sizes 8,7,6,5,4,3,2,1 over 2 shards: stripe → evens/odds of the
    // rank → shard 0 gets {8,6,4,2}=20, shard 1 gets {7,5,3,1}=16
    val docs = (1L to 8L).map(i => (i, 9L - i)).toDF("id", "sz")
    val got = graft.operators.Sampling.shardAssign(docs, "id", "sz", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.map(r => (r._3, r._2)).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap == Map(0L -> 20L, 1L -> 16L))
    // ties break by id: two equal sizes land on different shards
    val ties = Seq((10L, 5L), (11L, 5L)).toDF("id", "sz")
    val t2 = graft.operators.Sampling.shardAssign(ties, "id", "sz", 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(t2.map(_._3).toList == List(0L, 1L))
    // pack-domain guard fails loudly rather than mis-ranking
    val huge = Seq((1L << 41, 5L)).toDF("id", "sz")
    val e = intercept[Exception] {
      graft.operators.Sampling.shardAssign(huge, "id", "sz", 2).collect()
    }
    assert(e.getMessage.contains("packable domain") ||
      Option(e.getCause).exists(_.getMessage.contains("packable domain")))
    // duplicate ids fail loudly (ADVICE r14): they would collapse to
    // one rank and silently co-locate, skewing the stripe balance.
    // r16: the guard rides the groupBy(id) pass (raise_error in the
    // key expression, surfacing at the eager checkpoint), so the
    // failure arrives wrapped in Spark's execution exception
    val dup = Seq((7L, 5L), (7L, 3L)).toDF("id", "sz")
    val d = intercept[Exception] {
      graft.operators.Sampling.shardAssign(dup, "id", "sz", 2)
    }
    def chain(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + chain(t.getCause)
    assert(chain(d).contains("duplicate ids"), chain(d))
  }
}
