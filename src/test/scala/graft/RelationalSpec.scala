package graft

import graft.operators.Relational
import graft.operators.Relational.Lookup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val artist = Seq(
    (1L, "Alpha", 10L), (2L, "Beta", 20L), (3L, "Gamma", 99L)
  ).toDF("artist_id", "artist_name", "artist_area")

  private lazy val area = Seq((10L, "Canada"), (20L, "France"))
    .toDF("area_id", "area_name")

  private lazy val recording = Seq(
    (100L, 1L, "r1"), (101L, 1L, "r2"), (102L, 2L, "r3"), (103L, 7L, "orphan")
  ).toDF("recording_id", "recording_artist", "recording_name")

  test("keyBy projects key and full-row struct") {
    val kv = Relational.keyBy(artist, "artist_id")
    assert(kv.columns.toSeq == Seq("key", "value"))
    val row = kv.filter($"key" === 2L).select("value.artist_name").as[String].head()
    assert(row == "Beta")
  }

  test("innerJoinMerge merges namespaced columns, inner semantics") {
    val j = Relational.innerJoinMerge(artist, recording, "artist_id", "recording_artist")
    assert(j.columns.toSet ==
      Set("artist_id", "artist_name", "artist_area", "recording_id", "recording_artist", "recording_name"))
    assert(j.count() == 3) // artist 3 has no recordings; orphan has no artist
    assert(j.filter($"artist_id" === 1L).count() == 2)
  }

  test("lookupReplace maps ids to labels, missing id falls back to id-as-string") {
    val out = Relational.lookupReplace(artist,
      Lookup(area, "area_id", "area_name", Seq("artist_area")))
    val m = out.select("artist_id", "artist_area").as[(Long, String)].collect().toMap
    assert(m(1L) == "Canada" && m(2L) == "France")
    assert(m(3L) == "99") // the reference's "" + id fallback
  }

  test("lookupReplace with duplicate lookup keys does not multiply fact rows") {
    val dupArea = Seq((10L, "Canada"), (10L, "Canada"), (20L, "France"))
      .toDF("area_id", "area_name")
    val out = Relational.lookupReplace(artist,
      Lookup(dupArea, "area_id", "area_name", Seq("artist_area")))
    assert(out.count() == artist.count(), "duplicate lookup keys must not fan out fact rows")
    val m = out.select("artist_id", "artist_area").as[(Long, String)].collect().toMap
    assert(m(1L) == "Canada")
  }

  test("conflicting duplicate lookup keys resolve deterministically (max wins)") {
    val conflict = Seq((10L, "Aaa"), (10L, "Zzz"), (10L, "Mmm"))
      .toDF("area_id", "area_name")
    val out = Relational.lookupReplace(artist,
      Lookup(conflict, "area_id", "area_name", Seq("artist_area")))
    val m = out.select("artist_id", "artist_area").as[(Long, String)].collect().toMap
    assert(m(1L) == "Zzz", "winner must be max(value), stable across runs and partitionings")
  }

  test("lookupReplace handles multiple destination columns") {
    val df = Seq((1L, 10L, 20L)).toDF("id", "area", "begin_area")
    val out = Relational.lookupReplace(df,
      Lookup(area, "area_id", "area_name", Seq("area", "begin_area")))
    val r = out.head()
    assert(r.getString(1) == "Canada" && r.getString(2) == "France")
  }

  test("nest builds sorted child arrays; outer keeps childless parents with empty array") {
    val out = Relational.nest(artist, recording, "artist_id", "recording_artist",
      "recordings", sortChildBy = Seq("recording_id"))
    assert(out.count() == 3)
    val byId = out.collect().map(r => r.getLong(0) -> r.getSeq[Row](3)).toMap
    assert(byId(1L).map(_.getAs[Long]("recording_id")) == Seq(100L, 101L))
    assert(byId(3L).isEmpty)
  }

  test("nest inner drops childless parents (reference getOnly semantics)") {
    val out = Relational.nest(artist, recording, "artist_id", "recording_artist",
      "recordings", inner = true)
    assert(out.select("artist_id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("nestChunked splits oversized arrays into duplicate parent rows") {
    val many = (1 to 7).map(i => (100L + i, 1L, s"r$i")).toDF("recording_id", "recording_artist", "recording_name")
    val nested = Relational.nest(artist, many, "artist_id", "recording_artist",
      "recordings", inner = true, sortChildBy = Seq("recording_id"))
    val out = Relational.nestChunked(nested, "recordings", limit = 3)
    val sizes = out.select(size($"recordings")).as[Int].collect().sorted.toSeq
    assert(sizes == Seq(1, 3, 3)) // 7 children at limit 3 → 3+3+1
    // parent columns duplicated on every chunk row
    assert(out.select("artist_name").as[String].collect().forall(_ == "Alpha"))
    // chunk contents partition the original array in order
    val all = out.orderBy(element_at($"recordings", 1).getField("recording_id"))
      .select(flatten(collect_list($"recordings.recording_id")))
      .as[Seq[Long]].head()
    assert(all == (1 to 7).map(100L + _))
  }

  test("nestChunked keeps rows within the limit untouched") {
    val nested = Relational.nest(artist, recording, "artist_id", "recording_artist",
      "recordings", sortChildBy = Seq("recording_id"))
    val out = Relational.nestChunked(nested, "recordings", limit = 1000)
    assert(out.count() == nested.count())
  }

  test("basket pairStats: hand-checked support, confidence, lift, and dedup") {
    import spark.implicits._
    // baskets: 1:{A,B}, 2:{A,B,C}, 3:{A}, 4:{B} (duplicates collapse)
    val df = Seq((1L, "A"), (1L, "B"), (1L, "B"), (2L, "A"), (2L, "B"),
      (2L, "C"), (3L, "A"), (4L, "B")).toDF("b", "i")
    val got = graft.operators.Baskets.pairStats(df, "b", "i")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // AB: n=2, nA=3, nB=3, N=4: support 500000, confs 666666,
    // lift = 2*4*1e6/(3*3) = 888888
    assert(got(("A", "B")) == (("A", "B", 2L, 3L, 3L, 500000L, 666666L,
      666666L, 888888L)))
    // AC and BC from basket 2 only: n=1, nC=1 -> conf C->X = 1000000
    assert(got(("A", "C"))._9 == 1000000L * 4L / 3L) // 1*4e6/(3*1)=1333333
    assert(got(("B", "C"))._8 == 1000000L)
    assert(got.size == 3)
  }

  test("basket pairStats: minPairCount prunes, null baskets/items drop") {
    import spark.implicits._
    val df = Seq((Option(1L), Option("A")), (Option(1L), Option("B")),
      (Option(2L), Option("A")), (Option(2L), Option("B")),
      (Option(3L), Option("A")), (Option(3L), Option("C")),
      (Option.empty[Long], Option("Z")), (Option(9L), Option.empty[String]))
      .toDF("b", "i")
    val pruned = graft.operators.Baskets.pairStats(df, "b", "i", minPairCount = 2L)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(pruned == Set(("A", "B"))) // AC occurs once: pruned; Z/null gone
  }

  test("matchPattern: order-sensitive regex over per-key symbol sequences") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "v"), (1L, 2L, "x"), (1L, 3L, "c"), (1L, 4L, "p"), // v..c..p
      (2L, 1L, "c"), (2L, 2L, "v"), (2L, 3L, "p"),                // wrong order
      (3L, 1L, "v"), (3L, 2L, "e"), (3L, 3L, "c"), (3L, 4L, "p")  // e blocks
    ).toDF("k", "o", "sym")
    val got = graft.operators.Patterns
      .matchPattern(df, "k", "o", "sym", "v[^e]*c[^e]*p")
      .select("k", "seq", "matched", "n_matches")
      .as[(Long, String, Boolean, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "vxcp", true, 1L)))
    assert(got(2L) == ((2L, "cvp", false, 0L)))
    assert(got(3L) == ((3L, "vecp", false, 0L)))
  }

  test("matchPattern sequences are partition-order independent") {
    import spark.implicits._
    val rows = (0 until 500).map(i => ((i % 7).toLong, i.toLong,
      "vcpes".charAt(i % 5).toString))
    val a = graft.operators.Patterns.matchPattern(
      rows.toDF("k", "o", "sym"), "k", "o", "sym", "vc+p")
      .collect().map(_.toString).toSet
    val b = graft.operators.Patterns.matchPattern(
      rows.reverse.toDF("k", "o", "sym").repartition(11), "k", "o", "sym", "vc+p")
      .collect().map(_.toString).toSet
    assert(a == b)
  }
}
