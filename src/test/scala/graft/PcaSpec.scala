package graft

import graft.similarity.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gramStats matches a brute-force quantized computation exactly") {
    val vecs = Seq(
      Array(0.5f, -1.25f, 2.0f),
      Array(1.0f, 0.000001f, -0.0000004f), // rounding boundaries
      Array(-2.5f, 3.5f, 0.0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (g, s, n) = Pca.gramStats(df, "v", 3)
    def q(x: Float): Long = math.floor(x.toDouble * 1000000 + 0.5).toLong
    val qs = vecs.map(_.map(q))
    var idx = 0
    for (i <- 0 until 3; j <- i until 3) {
      val want = qs.map(r => r(i) * r(j)).sum
      assert(g(idx) == want, s"G($i,$j): got ${g(idx)}, want $want")
      idx += 1
    }
    for (i <- 0 until 3)
      assert(s(i) == qs.map(_(i)).sum, s"s($i)")
    assert(n == 3L)
  }

  test("fit recovers a planted principal direction and whitening normalizes it") {
    // 400 points on a line along (3,4)/5 plus tiny fixed off-axis jitter:
    // the top eigenvector must align with the line (|cos| > 0.999) and
    // carry almost all variance
    val dir0 = Array(0.6, 0.8)
    val pts = (0 until 400).map { i =>
      val tt = (i - 200) / 100.0
      val jitter = ((i * 37 % 11) - 5) / 5000.0 // deterministic, ±1e-3
      (i.toLong, Array((tt * dir0(0) + jitter * dir0(1)).toFloat,
        (tt * dir0(1) - jitter * dir0(0)).toFloat))
    }
    val df = pts.toDF("id", "v")
    val m = Pca.fit(df, "v", 2, 2)
    val cosTop = math.abs(m.components(0) * dir0(0) + m.components(1) * dir0(1))
    assert(cosTop > 0.999, s"top component misaligned: cos=$cosTop")
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1),
      s"planted line must dominate: ${m.eigenvalues.toList}")
    // projected coordinates: population variance of component c == λ_c
    val proj = df.select(posexplode(Pca.projectColumn(m, col("v"))).as(Seq("c", "y")))
      .groupBy("c").agg(count(lit(1)).as("n"), sum("y").as("sy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("c"), (col("syy") / col("n") -
        (col("sy") / col("n")) * (col("sy") / col("n"))).as("v"))
      .as[(Int, Double)].collect().toMap
    for (c <- 0 until 2)
      assert(math.abs(proj(c) - m.eigenvalues(c)) < 1e-4 * (m.eigenvalues(c) + 1e-9),
        s"component $c variance ${proj(c)} != eigenvalue ${m.eigenvalues(c)}")
    // whiten = true is exactly the manual 1/sqrt(λ) row scaling
    val w = Pca.fit(df, "v", 2, 2, whiten = true)
    for (c <- 0 until 2; i <- 0 until 2)
      assert(math.abs(w.components(c * 2 + i) -
        m.components(c * 2 + i) / math.sqrt(m.eigenvalues(c))) < 1e-12,
        s"whitened component ($c,$i) != manual scaling")
  }

  test("jacobi eigensolve is deterministic and orthonormal on a fixed matrix") {
    val mtx = Array(4.0, 1.0, 0.5, 1.0, 3.0, 0.25, 0.5, 0.25, 2.0)
    val (v1, e1) = Pca.jacobiEigSym(mtx, 3)
    val (v2, e2) = Pca.jacobiEigSym(mtx, 3)
    assert(v1.toList == v2.toList && e1.toList == e2.toList,
      "same input must yield bit-identical results")
    assert(v1(0) >= v1(1) && v1(1) >= v1(2), s"descending order: ${v1.toList}")
    // trace and orthonormality
    assert(math.abs(v1.sum - 9.0) < 1e-10, s"trace: ${v1.sum}")
    for (c <- 0 until 3; d <- 0 until 3) {
      val dot = (0 until 3).map(i => e1(c * 3 + i) * e1(d * 3 + i)).sum
      assert(math.abs(dot - (if (c == d) 1.0 else 0.0)) < 1e-10, s"V${c}.V$d=$dot")
    }
  }

  test("gram aggregate fails loudly on wrong dim and overflow, not silently") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception] { Pca.gramStats(bad, "v", 3) }
    assert(e.getMessage.contains("declared dim") ||
      Option(e.getCause).exists(_.getMessage.contains("declared dim")))
    // coordinates near the documented |x| ≤ 8 envelope times enough
    // rows to overflow a long must throw (addExact), not wrap
    val hot = (0 until 3000).map(i => (i.toLong, Array(3e6.toFloat))).toDF("id", "v")
    val o = intercept[Exception] { Pca.gramStats(hot.coalesce(1), "v", 1) }
    val msg = o.getMessage + Option(o.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("overflow") || msg.contains("Overflow"), msg)
  }

  test("affine projection refuses a wrong-length vector (ADVICE r15)") {
    // corpus vectors are dim-checked at fit time by gramStats, but
    // PROBE vectors reach the projection kernel unchecked: a
    // truncated projection would be a silently wrong ANN shortlist
    val df = (0 until 8).map(i => (i.toLong,
      Array(i.toFloat, (i % 3).toFloat, 1.0f))).toDF("id", "v")
    val model = Pca.fit(df, "v", 3, 2)
    val short = Seq((99L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      short.select(Pca.projectColumn(model, col("v"))).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("expected 3"), msg)
    // and the exact-length projection still flows
    val ok = Seq((99L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    assert(ok.select(Pca.projectColumn(model, col("v"))).collect().length == 1)
  }
}
