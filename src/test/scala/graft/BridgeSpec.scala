package graft

import graft.operators.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** B102: the price–volume–mix decomposition hand-checked per branch
  * (continuing / new / discontinued / zero-qty degenerate), the exact
  * reconciliation law, and partitioning invariance. */
class BridgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (item, group, isP2, qty, revCents)
  private val facts = Seq(
    // continuing item: P1 10 units @ 100c = 1000c; P2 12 units @ 110c = 1320c
    // volume = (12-10)*1000 div 10 = 200; price = 320 - 200 = 120
    ("a", "g1", false, 10L, 1000L),
    ("a", "g1", true, 12L, 1320L),
    // new item in P2
    ("b", "g1", false, 0L, 0L),
    ("b", "g1", true, 5L, 500L),
    // discontinued item
    ("c", "g2", false, 7L, 700L),
    // truncation case: (3-2)*205 div 2 = 102 (exact 102.5)
    ("d", "g2", false, 2L, 205L),
    ("d", "g2", true, 3L, 300L))

  test("hand-checked effects per branch, exact reconciliation") {
    val out = Bridge
      .priceVolumeMix(facts.toDF("i", "g", "p2", "q", "r"),
        "i", "g", "p2", "q", "r")
      .select("g", "qty1", "qty2", "rev1_c", "rev2_c", "delta_c",
        "volume_c", "price_c", "new_c", "disc_c")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toList
    // g1: delta = (1320-1000) + 500 = 820; volume 200, price 120, new 500
    // g2: delta = -700 + (300-205) = -605; volume 102, price 95-102=-7,
    //     disc -700
    assert(out == List(
      ("g1", 10L, 17L, 1000L, 1820L, 820L, 200L, 120L, 500L, 0L),
      ("g2", 9L, 3L, 905L, 300L, -605L, 102L, -7L, 0L, -700L)))
    out.foreach { case (_, _, _, _, _, d, v, p, n, x) =>
      assert(v + p + n + x == d, "effects must re-add to delta exactly")
    }
  }

  test("zero-qty-nonzero-revenue degenerates absorb into price, closure holds") {
    val weird = Seq(
      ("z", "g", false, 0L, 123L), // revenue with no quantity, P1 only
      ("y", "g", true, 0L, -50L))
    val out = Bridge
      .priceVolumeMix(weird.toDF("i", "g", "p2", "q", "r"),
        "i", "g", "p2", "q", "r")
      .select("delta_c", "volume_c", "price_c", "new_c", "disc_c")
      .as[(Long, Long, Long, Long, Long)].head()
    val (d, v, p, n, x) = out
    assert(d == -173L && v == 0L && n == 0L && x == 0L && p == d)
  }

  test("partitioning invariance") {
    val df = facts.toDF("i", "g", "p2", "q", "r")
    val a = Bridge.priceVolumeMix(df, "i", "g", "p2", "q", "r")
      .collect().map(_.toString).sorted.toList
    val b = Bridge.priceVolumeMix(df.repartition(7), "i", "g", "p2", "q", "r")
      .collect().map(_.toString).sorted.toList
    assert(a == b)
  }
}
