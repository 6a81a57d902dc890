package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialize a larger scale factor from the driver's sf0.1 tables by
 * key-shifted replication — the second scale point the bench sweep
 * needs (judge r14 ask #5): `sf1` = 10 consistent copies of sf0.1.
 *
 * Replication is FK-CONSISTENT: every key column of a fact shifts by
 * the same per-table stride as the dimension it references, so each
 * replica is a closed TPC-H-ish world and every join's row count
 * scales exactly linearly (the property that makes per-query sf1/sf0.1
 * ratios interpretable as scan/shuffle scaling, not data-shape drift).
 * Strides are maxKey+1, computed from the data — replicas can never
 * collide, and ids stay far below the 2^40 packable-domain guards.
 * nation/region stay unreplicated (dimensions with fixed domains, as
 * at every real TPC-H scale factor, where nation is always 25 rows).
 *
 * documents/embeddings replicate with UNCHANGED payloads: every doc
 * gains 9 exact copies — deliberately the mass-duplication regime the
 * layered dedup stack is designed for (exact-collapse first, so LSH
 * candidate structure stays bounded; ScaleProbe's 20× drift gates pin
 * the keep-set semantics under exactly this transform).
 *
 * Timestamp columns pass through untouched (event streams get denser
 * per hour rather than longer — window row counts scale linearly
 * either way). Output mirrors the driver's one-file-per-table layout
 * so single-file-scan behavior (and the operators' `spread()`
 * handling of it) is exercised identically at both scale points.
 *
 * Usage: runMain graft.ScaleData <srcDir> <destDir> <factor>
 */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val (src, dest, n) = (args(0), args(1), args(2).toInt)
    require(n >= 1, s"factor must be >= 1, got $n")
    val spark = Sessions.local()
    try build(spark, src, dest, n)
    finally spark.stop()
  }

  def build(spark: SparkSession, src: String, dest: String, n: Int): Unit = {
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    /** n copies of `df`, each listed key column shifted by
     * replica × its stride. */
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val reps = spark.range(n).select(col("id").as("__rep"))
      shifts.foldLeft(df.crossJoin(broadcast(reps))) { case (acc, (k, s)) =>
        acc.withColumn(k, col(k) + col("__rep") * s)
      }.drop("__rep")
    }

    def write(df: DataFrame, name: String): Unit = {
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dest/__stage_$name")
      // driver layout is NAME.parquet as a single file, not a dir
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(conf)
      val staged = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dest/__stage_$name/part-*.parquet"))
      require(staged.length == 1, s"$name: expected 1 staged part")
      val target = new org.apache.hadoop.fs.Path(s"$dest/$name.parquet")
      fs.delete(target, false): Unit
      require(fs.rename(staged(0).getPath, target), s"$name: rename failed")
      fs.delete(new org.apache.hadoop.fs.Path(s"$dest/__stage_$name"), true): Unit
      println(s"SCALE_TABLE $name rows=${spark.read.parquet(target.toString).count()}")
    }

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")

    // dimensions with fixed domains: copy as-is
    write(t("region"), "region")
    write(t("nation"), "nation")

    val cust = t("customer"); val strideC = stride(cust, "c_custkey")
    val supp = t("supplier"); val strideS = stride(supp, "s_suppkey")
    val part = t("part");     val strideP = stride(part, "p_partkey")
    val ord  = t("orders");   val strideO = stride(ord, "o_orderkey")
    write(replicate(cust, "c_custkey" -> strideC), "customer")
    write(replicate(supp, "s_suppkey" -> strideS), "supplier")
    write(replicate(part, "p_partkey" -> strideP), "part")
    write(replicate(ord, "o_orderkey" -> strideO, "o_custkey" -> strideC), "orders")
    write(replicate(t("lineitem"),
      "l_orderkey" -> strideO, "l_partkey" -> strideP, "l_suppkey" -> strideS),
      "lineitem")

    val ev = t("events")
    write(replicate(ev,
      "event_id" -> stride(ev, "event_id"), "user_id" -> stride(ev, "user_id")),
      "events")

    val docs = t("documents")
    write(replicate(docs, "doc_id" -> stride(docs, "doc_id")), "documents")
    val emb = t("embeddings")
    write(replicate(emb, "vec_id" -> stride(emb, "vec_id")), "embeddings")
    println(s"SCALE_DONE dest=$dest factor=$n")
  }
}
