package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: run the flagship `entry` the way the driver does
  * (sf0.001, rows>0) and print its shape. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    println(s"ENTRY_COLS=${df.columns.length}")
    df.show(3, 30)
    spark.stop()
  }
}
