package graft

import graft.operators.Relational
import graft.schema.SchemaBuilder
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("conformToSchema projects, casts, nulls missing fields, chunks arrays") {
    val schema = SchemaBuilder.create()
      .intField("artist_id")
      .stringField("artist_name")
      .stringField("not_present")
      .field(SchemaBuilder.create()
        .intField("recording_id")
        .repeatedRecord("artist_recordings"))
      .schema()
    val recs = (1L to 7L).map(i => Row(i))
    val df = Seq((5, "Alpha")).toDF("artist_id", "artist_name")
      .withColumn("artist_recordings",
        array((1L to 7L).map(i => struct(lit(i).as("recording_id"))): _*))
      .withColumn("extra_col_dropped", lit("x"))
    val out = Relational.conformToSchema(df, schema, nestingLimit = 3)
    assert(out.schema.fieldNames.toSeq ==
      Seq("artist_id", "artist_name", "not_present", "artist_recordings"))
    assert(out.schema("artist_id").dataType.typeName == "long") // cast int→long
    val rows = out.collect()
    assert(rows.length == 3) // 7 nested at limit 3 → 3 duplicate rows
    assert(rows.forall(_.isNullAt(2)))
    assert(rows.map(_.getAs[scala.collection.Seq[Row]]("artist_recordings").length).sorted.toSeq
      == Seq(1, 3, 3))
  }
}
