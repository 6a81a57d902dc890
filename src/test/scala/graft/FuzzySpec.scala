package graft

import graft.operators.Fuzzy
import org.scalatest.funsuite.AnyFunSuite

class FuzzySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("finds known near-pairs and assigns exact distances") {
    val df = Seq("red bolt", "old bolt", "red ring", "widget").toDF("s")
    val got = Fuzzy.fuzzyNamePairs(df, "s", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("old bolt", "red bolt", 2L)))
  }

  test("blocking is complete vs brute force, short strings included") {
    val rnd = new scala.util.Random(21)
    val alphabet = "abcx"
    val names = (Seq("", "a", "ab", "abc") ++
      Seq.fill(90)((0 to rnd.nextInt(9)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)).distinct
    val want = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    val got = Fuzzy.fuzzyNamePairs(names.toDF("s"), "s", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("duplicate rows collapse to the distinct domain first") {
    val df = (1 to 1000).map(_ => "same name").toDF("s")
      .union(Seq("same namx").toDF("s"))
    val got = Fuzzy.fuzzyNamePairs(df, "s", maxDist = 2)
      .as[(String, String, Long)].collect().toList
    assert(got == List(("same name", "same namx", 1L)))
  }
}
