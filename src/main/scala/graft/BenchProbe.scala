package graft

import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for the minhash dedup path. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.table(spark, dir, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("shingle-hash only") {
      docs.select(array_distinct(transform(
        TextFunctions.wordShingles(col("text"), 3), s => xxhash64(s))).as("h"))
        .select(sum(size(col("h")))).collect()
    }
    time("signature (64 perms)") {
      docs.select(Dedup.minhashSignature(col("text")).as("sig"))
        .select(sum(size(col("sig")))).collect()
    }
    val cands = time("candidates full") {
      Dedup.minhashCandidates(docs, "doc_id", "text").count()
    }
    println(s"PROBE candidate pairs: $cands")
    spark.stop()
  }
}
