package graft

import graft.functions.{TextFunctions => TF}
import graft.functions.expressions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId identifies real multilingual samples") {
    val samples = Seq(
      ("en", "the quick brown fox is in the house and it is ready for this test"),
      ("fr", "le chat est dans la maison et il est là pour vous avec les autres"),
      ("es", "el perro es una mascota y las casas en la ciudad son para su familia"),
      ("de", "der hund ist ein tier und die katze ist nicht mit ich hier"),
      ("zh", "这是一个中文句子用来测试语言识别功能"),
      ("und", "xyzzy plugh qwerty asdf"))
    val got = samples.toDF("expected", "text")
      .select($"expected", TF.langId($"text").as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.getString(1)))
  }

  test("token counts: whitespace vs bpe-ish segmentation") {
    val df = Seq("Hello, world! 42 tests pass.").toDF("text")
    val r = df.select(
      size(TF.wsTokens($"text")),
      size(TF.bpeishTokens($"text"))).head()
    assert(r.getInt(0) == 5)
    // Hello , world ! 42 tests pass . → 8
    assert(r.getInt(1) == 8)
  }

  test("wordShingles emits n-grams, collapses short texts") {
    val df = Seq(("a b c d", "a b")).toDF("long", "short")
    val r = df.select(TF.wordShingles($"long", 3), TF.wordShingles($"short", 3)).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getSeq[String](1) == Seq("a b"))
  }

  test("quality ratios are bounded and ordered sensibly") {
    val df = Seq(
      ("clean", "the cat sat on the mat and looked at the dog with interest"),
      ("noisy", "!!! ### $$$ %%% ^^^ &&& *** 12345 !!!! ????")).toDF("kind", "text")
    val m = df.select($"kind", TF.punctRatio($"text").as("p"), TF.stopwordRatio($"text").as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("clean")._1 < 0.05 && m("clean")._2 > 0.2)
    assert(m("noisy")._1 > 0.5 && m("noisy")._2 == 0.0)
  }

  test("fingerprint64 is deterministic; winnow overlaps for shared substrings") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog near the river bank today"),
      ("b", "the quick brown fox jumps over the lazy dog near the river bank today"),
      ("c", "PREFIX the quick brown fox jumps over the lazy dog near the river bank"),
      ("d", "entirely unrelated content with no overlap whatsoever in any window")
    ).toDF("k", "text")
    val rows = df.select($"k", fingerprint64($"text"), winnow($"text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2).toSet)).toMap
    assert(rows("a")._1 == rows("b")._1)
    assert(rows("a")._1 != rows("c")._1)
    val overlapNear = (rows("a")._2 intersect rows("c")._2).size.toDouble / rows("a")._2.size
    val overlapFar  = (rows("a")._2 intersect rows("d")._2).size.toDouble / rows("a")._2.size
    assert(overlapNear > 0.3, s"near overlap $overlapNear")
    assert(overlapFar == 0.0)
  }
}
