package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: run the flagship `entry` the way the driver does
  * (sf0.001, rows>0) and print its shape. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    println(s"ENTRY_COLS=${df.columns.length}")
    df.show(3, 30)

    // full BQETLNested-equivalent pipeline: nested denorm → conform to
    // a declared schema (with the nesting limit) → truncate-and-load
    import graft.schema.SchemaBuilder
    val nestedSchema = SchemaBuilder.create()
      .intField("c_custkey")
      .stringField("c_name")
      .doubleField("c_acctbal")
      .field(SchemaBuilder.create()
        .intField("o_orderkey")
        .doubleField("o_totalprice")
        .intField("l_linenumber")
        .doubleField("l_extendedprice")
        .repeatedRecord("order_items"))
      .schema()
    val nested = graft.operators.Relational.conformToSchema(
      graft.pipelines.Denorm.nestedDenorm(spark, "/root/testdata/sf0.001"),
      nestedSchema, nestingLimit = 10)
    val out = java.nio.file.Files.createTempDirectory("nested_sink").toString + "/t"
    graft.sinks.TableSink.writeTruncate(nested, out)
    val back = spark.read.parquet(out)
    println(s"NESTED_SINK_ROWS=${back.count()} NESTED_SINK_FIELDS=${back.schema.fieldNames.mkString(",")}")
    spark.stop()
  }
}
