package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 groups, deliberately including a duplicate-score tie in group a
  private lazy val rows = Seq(
    ("a", 10L, 1L), ("a", 30L, 2L), ("a", 30L, 3L), ("a", 20L, 4L), ("a", 5L, 5L),
    ("b", 7L, 6L), ("b", 7L, 7L),
    ("c", 1L, 8L)
  ).toDF("g", "score", "id")

  private def windowRef(k: Int) = {
    val w = Window.partitionBy("g").orderBy($"score".desc, $"id".asc)
    rows.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k).select("g", "rank", "score", "id")
  }

  test("bounded aggregate equals the window row_number formulation") {
    for (k <- Seq(1, 2, 3, 10)) {
      val got = TopK.topKPerGroup(rows, Seq("g"), "score", "id", k)
      val ref = windowRef(k)
      assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
        s"k=$k mismatch: ${got.collect().mkString} vs ${ref.collect().mkString}")
    }
  }

  test("result is invariant to input partitioning (merge correctness)") {
    val base = TopK.topKPerGroup(rows, Seq("g"), "score", "id", 2).collect().toSet
    val parts = TopK.topKPerGroup(rows.repartition(7), Seq("g"), "score", "id", 2)
      .collect().toSet
    assert(base == parts)
  }

  test("ties break deterministically on the lower id") {
    val got = TopK.topKPerGroup(rows.filter($"g" === "a"), Seq("g"), "score", "id", 2)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L)) // both score 30, id-ascending
  }

  test("groups smaller than k emit all their rows, ranked") {
    val got = TopK.topKPerGroup(rows.filter($"g" === "b"), Seq("g"), "score", "id", 5)
      .orderBy("rank").select("rank", "id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 6L), (2L, 7L)))
  }

  test("topKWithOthers: OTHERS accounts for the full tail; shares over group mass") {
    import spark.implicits._
    val rollup = Seq(
      ("g", "a", 50L), ("g", "b", 30L), ("g", "c", 15L), ("g", "d", 5L),
      ("h", "x", 10L) // fewer labels than k: no OTHERS row
    ).toDF("grp", "lab", "v")
    val out = graft.operators.TopK.topKWithOthers(rollup, Seq("grp"), "lab", "v", k = 2)
      .select("grp", "lab", "rank", "v", "n_members", "share_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("g", "a", 1L, 50L, 1L, 500000L),
      ("g", "b", 2L, 30L, 1L, 300000L),
      ("g", "OTHERS", 3L, 20L, 2L, 200000L),
      ("h", "x", 1L, 10L, 1L, 1000000L)))
  }

  test("topKWithOthers ties rank deterministically by label") {
    import spark.implicits._
    val rollup = Seq(("g", "b", 10L), ("g", "a", 10L), ("g", "c", 10L))
      .toDF("grp", "lab", "v")
    val out = graft.operators.TopK.topKWithOthers(rollup, Seq("grp"), "lab", "v", k = 2)
      .select("lab", "rank").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("b", 2L), ("OTHERS", 3L)))
  }
}
