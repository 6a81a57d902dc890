package graft

import graft.similarity.Projection
import graft.text.WeakLabel
import org.scalatest.funsuite.AnyFunSuite

class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signMatrix is deterministic, ±1, and roughly balanced") {
    val m = Projection.signMatrix(16, 64)
    assert(m.length == 16 * 64 && m.forall(v => v == 1L || v == -1L))
    assert(m.sameElements(Projection.signMatrix(16, 64)))
    val pos = m.count(_ == 1L)
    assert(pos > 400 && pos < 624, s"badly unbalanced sign matrix: $pos")
  }

  test("signedProjection kernel matches a naive reimplementation") {
    val rnd = new scala.util.Random(3)
    val dim = 64
    val k = 16
    val signs = Projection.signMatrix(k, dim)
    val vecs = Seq.fill(50)(Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat))
    val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
      .select($"id", Projection.projectColumn($"vec", k, dim).as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val q = v.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      val want = (0 until k).map(r =>
        (0 until dim).map(j => signs(r * dim + j) * q(j)).sum)
      assert(got(i.toLong) == want, s"vec $i")
    }
  }

  test("projection approximately preserves norms (JL property)") {
    val rnd = new scala.util.Random(9)
    val dim = 64
    val k = 16
    val vecs = Seq.fill(300)(Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat))
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
      .select($"id", Projection.projectColumn($"vec", k, dim).as("p"), $"vec")
      .as[(Long, Seq[Long], Seq[Float])].collect()
    val ratios = rows.map { case (_, p, v) =>
      val q = v.map(x => Math.round(x.toDouble * 1e6))
      p.map(x => x.toDouble * x).sum / (k * q.map(x => x.toDouble * x).sum)
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"JL mean ratio off: $mean")
  }

  test("weak labeling matches keywords case-insensitively in rule order") {
    val rules = Seq("a" -> Seq("apple"), "b" -> Seq("banana", "berry"))
    val docs = Seq(
      (1L, "I ate an APPLE and a berry"),
      (2L, "just a banana"),
      (3L, "nothing relevant"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = WeakLabel.label(docs, "text", rules)
      .select("doc_id", "labels", "primary_label", "n_labels")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == Set(
      (1L, "a,b", "a", 2L),
      (2L, "b", "b", 1L),
      (3L, "", "unlabeled", 0L),
      (4L, "", "unlabeled", 0L)))
  }
}
