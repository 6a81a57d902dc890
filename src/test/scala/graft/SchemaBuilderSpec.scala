package graft

import graft.schema.SchemaBuilder
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaBuilderSpec extends AnyFunSuite {

  test("builds the BQETLNested schema shape (flat fields + repeated record)") {
    val s = SchemaBuilder.create()
      .intField("artist_id")
      .stringField("artist_name")
      .timestampField("artist_last_updated")
      .boolField("artist_ended")
      .field(SchemaBuilder.create()
        .intField("recording_id")
        .stringField("recording_name")
        .repeatedRecord("artist_recordings"))
      .schema()
    assert(s("artist_id").dataType == LongType)
    assert(s("artist_name").dataType == StringType)
    assert(s("artist_last_updated").dataType == TimestampType)
    assert(s("artist_ended").dataType == BooleanType)
    val rec = s("artist_recordings").dataType.asInstanceOf[ArrayType]
    val inner = rec.elementType.asInstanceOf[StructType]
    assert(inner.fieldNames.toSeq == Seq("recording_id", "recording_name"))
  }
}
