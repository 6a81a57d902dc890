package graft

import graft.sinks.TableSink
import org.scalatest.funsuite.AnyFunSuite

class TableSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writeTruncate overwrites existing data (WRITE_TRUNCATE semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/t"
    TableSink.writeTruncate(Seq((1, "old"), (2, "old")).toDF("k", "v"), dir)
    TableSink.writeTruncate(Seq((3, "new")).toDF("k", "v"), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1 && back.select("v").as[String].head() == "new")
  }

  test("bucketed tables join without an exchange") {
    import org.apache.spark.sql.functions.sum
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_items")
    // a previously failed run can leave an orphaned managed-table dir
    Seq("bkt_orders", "bkt_items").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    TableSink.writeBucketed(
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "total"), "bkt_orders", Seq("k"), 4)
    TableSink.writeBucketed(
      Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("k", "price"), "bkt_items", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_orders").join(spark.table("bkt_items"), "k")
        .groupBy("k").agg(sum("price").as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitionBy produces partition-pruned layout") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/p"
    TableSink.writeTruncate(Seq((1, "a"), (2, "b")).toDF("k", "part"), dir,
      partitionBy = Seq("part"))
    assert(new java.io.File(dir, "part=a").exists())
    assert(spark.read.parquet(dir).where($"part" === "a").count() == 1)
  }
}
