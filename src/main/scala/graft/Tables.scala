package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers for loading the driver's parquet test tables. */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
