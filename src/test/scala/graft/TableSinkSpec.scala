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

  test("partitionBy produces partition-pruned layout") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString + "/p"
    TableSink.writeTruncate(Seq((1, "a"), (2, "b")).toDF("k", "part"), dir,
      partitionBy = Seq("part"))
    assert(new java.io.File(dir, "part=a").exists())
    assert(spark.read.parquet(dir).where($"part" === "a").count() == 1)
  }
}
