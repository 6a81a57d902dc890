package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA / whitening over an embedding column (C81) — the
 * standard pre-step before SemDeDup-style clustering, ANN indexing,
 * and duplicate detection in embedding space (decorrelated, unit-
 * variance coordinates make cosine/L2 thresholds comparable across
 * dimensions).
 *
 * Split the way a 100 TB corpus demands:
 *  - ONE distributed pass: [[graft.functions.GramAggregate]]
 *    accumulates exact integer (G, s, n) in a fixed dim²/2-long
 *    buffer — map-side combined, one buffer per partition shuffles,
 *    vectors never do. Micro-unit quantization (the C58 discipline)
 *    makes the pass exactly replayable by a second engine.
 *  - BOUNDED driver step: exact covariance from (G, s, n), then a
 *    deterministic cyclic Jacobi eigensolve of the dim×dim symmetric
 *    matrix (dim ≤ 1024 by the aggregate's guard; 64×64 here —
 *    microseconds, no external linear-algebra dependency).
 *  - ONE projection pass: y = Vᵀ(x − μ) (optionally ÷ √λ for
 *    whitening) as a codegen'd kernel with the k×dim matrix embedded
 *    in the plan ([[graft.functions.expressions.affineProject]]) —
 *    no shuffle, no broadcast table.
 */
object Pca {

  /** Micro-units per coordinate: exact at 6 decimal places, leaving
   * ~10⁵ rows/partition of Long headroom at |x| ≤ 8 (fail-loud
   * beyond — the aggregate uses addExact/multiplyExact). */
  val MicroScale = 1000000L

  /** Exact integer second-moment stats of `vecCol`:
   * (upper-tri gram, first moments, n) — collected to the driver as
   * ONE bounded row (dim(dim+1)/2 + dim + 1 longs). */
  def gramStats(df: DataFrame, vecCol: String, dim: Int,
      scale: Long = MicroScale): (Array[Long], Array[Long], Long) = {
    val row = df.agg(graft.functions.expressions
        .gramAggregate(col(vecCol), dim, scale).as("g"))
      .head().getSeq[Long](0).toArray
    val triLen = dim * (dim + 1) / 2
    (row.take(triLen), row.slice(triLen, triLen + dim), row(triLen + dim))
  }

  /** Exact covariance (doubles, but derived from exact integers — the
   * same inputs on any engine give the same matrix):
   * cov_ij = (n·G_ij − s_i·s_j) / n² / scale². */
  def covariance(g: Array[Long], s: Array[Long], n: Long, dim: Int,
      scale: Long = MicroScale): Array[Double] = {
    require(n > 1, s"pca: need more than one vector, got $n")
    val cov = new Array[Double](dim * dim)
    val nB = BigInt(n)
    val sc2 = (BigDecimal(scale) * BigDecimal(scale)) * BigDecimal(nB * nB)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      // exact integer numerator (BigInt: n·G and s_i·s_j overflow Long
      // at corpus scale), one decimal division at the end
      val num = nB * BigInt(g(idx)) - BigInt(s(i)) * BigInt(s(j))
      val v = (BigDecimal(num) / sc2).toDouble
      cov(i * dim + j) = v
      cov(j * dim + i) = v
      idx += 1
    }
    cov
  }

  /** Deterministic cyclic Jacobi eigensolve of a symmetric dim×dim
   * matrix: fixed sweep order, fixed convergence threshold — same
   * input always yields the same (eigenvalues desc, row-major
   * eigenvectors). O(dim³) per sweep on the DRIVER; dim is bounded by
   * the aggregate, never data-sized. */
  def jacobiEigSym(m0: Array[Double], dim: Int,
      maxSweeps: Int = 64, tol: Double = 1e-14): (Array[Double], Array[Double]) = {
    val a = m0.clone()
    val v = new Array[Double](dim * dim)
    for (i <- 0 until dim) v(i * dim + i) = 1.0
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until dim; j <- i + 1 until dim) s += a(i * dim + j) * a(i * dim + j)
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol * tol) {
      for (p <- 0 until dim; q <- p + 1 until dim) {
        val apq = a(p * dim + q)
        if (math.abs(apq) > 1e-300) {
          val theta = (a(q * dim + q) - a(p * dim + p)) / (2.0 * apq)
          val t = math.signum(theta) match {
            case 0.0 => 1.0
            case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until dim) {
            val aip = a(i * dim + p); val aiq = a(i * dim + q)
            a(i * dim + p) = c * aip - s * aiq
            a(i * dim + q) = s * aip + c * aiq
          }
          for (i <- 0 until dim) {
            val api = a(p * dim + i); val aqi = a(q * dim + i)
            a(p * dim + i) = c * api - s * aqi
            a(q * dim + i) = s * api + c * aqi
          }
          for (i <- 0 until dim) {
            val vip = v(i * dim + p); val viq = v(i * dim + q)
            v(i * dim + p) = c * vip - s * viq
            v(i * dim + q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until dim).sortBy(i => -a(i * dim + i))
    val values = order.map(i => a(i * dim + i)).toArray
    val vectors = new Array[Double](dim * dim)
    for ((src, dst) <- order.zipWithIndex; i <- 0 until dim)
      vectors(dst * dim + i) = v(i * dim + src) // row `dst` = eigenvector
    (values, vectors)
  }

  /** Fitted model: mean (original units), eigenvalues desc, row-major
   * k×dim component matrix (whitened = rows ÷ √λ when requested). */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Double], dim: Int, k: Int)

  /** One distributed pass + bounded driver eigensolve. `whiten` scales
   * each component row by 1/√λ so projected coordinates have unit
   * variance. Components with λ below `minVariance` are dropped
   * fail-soft from the tail (they carry no signal; whitening would
   * divide by ~0). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int,
      whiten: Boolean = false, minVariance: Double = 1e-12): Model = {
    require(k >= 1 && k <= dim, s"pca: k must be in [1, $dim], got $k")
    val (g, s, n) = gramStats(df, vecCol, dim)
    val cov = covariance(g, s, n, dim)
    val (vals, vecs) = jacobiEigSym(cov, dim)
    val kept = (0 until k).takeWhile(c => vals(c) > minVariance)
    require(kept.nonEmpty, s"pca: no component above minVariance=$minVariance")
    val kk = kept.length
    val comp = new Array[Double](kk * dim)
    for (c <- 0 until kk; i <- 0 until dim) {
      val w = if (whiten) 1.0 / math.sqrt(vals(c)) else 1.0
      comp(c * dim + i) = vecs(c * dim + i) * w
    }
    val mean = Array.tabulate(dim)(i => s(i).toDouble / n / MicroScale)
    Model(mean, vals.take(kk), comp, dim, kk)
  }

  /** Projection column y = components·(x − mean) — codegen'd, plan-
   * embedded matrix, no shuffle. */
  def projectColumn(model: Model, vec: Column): Column =
    graft.functions.expressions.affineProject(vec, model.components, model.mean, model.dim)
}
