package graft

import graft.sources.JsonTables
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val artistSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("gid", StringType),
    StructField("name", StringType), StructField("length", FloatType),
    StructField("video", BooleanType)))

  test("widened maps every integral to Long and fractional to Double") {
    val w = JsonTables.widened(artistSchema)
    assert(w("id").dataType == LongType)
    assert(w("length").dataType == DoubleType)
    assert(w("gid").dataType == StringType)
    assert(w("video").dataType == BooleanType)
  }

  test("loadTableFromText namespaces columns and parses typed values") {
    val lines = Seq(
      """{"id": 5, "gid": "abc", "name": "A Song", "length": 123.5, "video": false}""",
      """{"id": 6, "gid": "def", "name": "B Song", "length": null, "video": true}"""
    ).toDS()
    val df = JsonTables.loadTableFromText(lines, "recording", artistSchema)
    assert(df.columns.toSeq == Seq(
      "recording_id", "recording_gid", "recording_name", "recording_length", "recording_video"))
    val rows = df.orderBy("recording_id").collect()
    assert(rows(0).getLong(0) == 5L && rows(0).getDouble(3) == 123.5 && !rows(0).getBoolean(4))
    assert(rows(1).isNullAt(3) && rows(1).getBoolean(4))
  }

  test("malformed lines become all-null rows, like the reference's empty datum") {
    // the reference's JSONReader catches the parse exception and
    // returns an EMPTY data object (JSONReader.java:96-99) — Spark's
    // PERMISSIVE mode produces the equivalent all-null row
    val lines = Seq(
      """{"id": 1, "gid": "ok", "name": "N", "length": 1.0, "video": false}""",
      """{"id": 2, BROKEN JSON""").toDS()
    val df = JsonTables.loadTableFromText(lines, "t", artistSchema)
    assert(df.count() == 2)
    val bad = df.filter(df("t_id").isNull).collect()
    assert(bad.length == 1 && bad(0).toSeq.forall(_ == null))
  }

  test("CsvLines quarantines malformed lines and keeps partial parses") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("pr", StringType),
      StructField("v", LongType)))
    val lines = Seq(
      (1L, "10,HIGH,500"),      // clean
      (2L, "20,LOW,xnum"),      // type failure on v
      (3L, "30,MED"),           // missing trailing field
      (4L, "40,URGENT,7,extra") // excess tokens
    ).toDF("src_id", "line")
    val got = graft.sources.CsvLines.parseWithQuarantine(lines, "line", schema)
      .orderBy("src_id")
      .select("src_id", "k", "pr", "v", "is_corrupt", "quarantine")
      .collect()
    assert(got(0).toSeq == Seq(1L, 10L, "HIGH", 500L, false, null))
    // type failure: parseable prefix fields kept, bad field null, line quarantined
    assert(got(1).toSeq == Seq(2L, 20L, "LOW", null, true, "20,LOW,xnum"))
    // missing trailing field: token-count mismatch is malformed too —
    // parsed prefix kept, missing field null, line quarantined
    assert(got(2).getBoolean(4) == true && got(2).isNullAt(3))
    assert(got(2).getString(5) == "30,MED")
    // excess tokens: quarantined
    assert(got(3).getBoolean(4) == true && got(3).getString(5) == "40,URGENT,7,extra")
  }
}
