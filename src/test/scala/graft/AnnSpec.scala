package graft

import graft.dedup.Dedup
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
           math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(42)
    (0L until 100L).map(i => (i, Array.fill(32)(rnd.nextGaussian().toFloat)))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("bruteForceTopK matches a driver-side exact computation") {
    val probes = df.filter($"vec_id" < 2)
    val got = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (p <- 0L until 2L) {
      val pv = vecs(p.toInt)._2
      val expected = vecs.filter(_._1 != p)
        .map { case (id, v) => (id, cos(pv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      val gotIds = (1 to 5).map(r => got((p, r.toLong)))
      assert(gotIds == expected, s"probe $p")
    }
  }

  test("ivfTopK returns correctly-ranked subset with adequate recall") {
    val probes = df.filter($"vec_id" < 10)
    val brute = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.ivfTopK(df, probes, "vec_id", "embedding", 32, 5,
      numCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"ivf recall@5 = $recall")
  }

  test("nearestCentroids handles zero vectors without NaN") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val centroids = Array(1.0, 0.0, 0.0, 0.0) // two 2-dim centroids; second is zero
    val zeroProbe = new GenericArrayData(Array(0.0, 0.0))
    val cells = graft.functions.HashOps.nearestCentroids(zeroProbe, centroids, 2, 2, isFloat = false)
    assert(cells.toSeq == Seq(0, 1), "zero probe must fall back to similarity 0, index order")
    val realProbe = new GenericArrayData(Array(1.0, 1.0))
    val cells2 = graft.functions.HashOps.nearestCentroids(realProbe, centroids, 2, 2, isFloat = false)
    assert(cells2.head == 0, "real probe vs zero centroid must rank the nonzero centroid first")
  }

  test("lshTopK returns correctly-ranked subset with adequate recall") {
    val probes = df.filter($"vec_id" < 10)
    val brute = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.lshTopK(df, probes, "vec_id", "embedding", 32, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 = $recall") // bucketed candidates only
    // within-bucket ranking must still be by true cosine
    val ranks = Ann.lshTopK(df, probes, "vec_id", "embedding", 32, 5)
      .groupBy("probe_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
      .collect()
    ranks.foreach(r => assert(r.getLong(1) == r.getLong(2))) // ranks dense 1..n
  }
}
