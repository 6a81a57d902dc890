package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Table sink with the reference's load semantics (reference:
 * src/main/java/com/google/cloud/bqetl/BQETLSimple.java:113-120 —
 * BigQueryIO WRITE_TRUNCATE + CREATE_IF_NEEDED): overwrite the target
 * if present, create it if not. The zero-egress container has no real
 * warehouse, so the sink targets columnar files; the semantics
 * (truncate-and-load, schema enforced by the DataFrame, optional
 * partitioning for pruned downstream scans) are the same.
 *
 * Scale notes: `partitionBy` yields partition-pruned reads downstream;
 * `targetPartitions` controls output file count (repartition before
 * write) so a 1000-executor job doesn't emit millions of tiny files.
 */
object TableSink {

  def writeTruncate(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      targetPartitions: Option[Int] = None): Unit = {
    val out = targetPartitions.fold(df)(df.repartition)
    val w = out.write.mode(SaveMode.Overwrite).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /**
   * Truncate-and-load into a bucketed managed table: both sides of a
   * recurring fact-fact join written with the same bucket spec join
   * WITHOUT a shuffle (Catalyst sees the matching hash distribution).
   * This is the 100 TB answer to the denorm spine — bucket orders and
   * lineitem by the join key once at ingest, and every subsequent
   * join/aggregation on that key is exchange-free.
   */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /**
   * Range-sorted layout: globally range-partition on `sortCols` and
   * sort within partitions before writing, so every output file holds
   * a disjoint sort-key range. Downstream scans with a predicate on
   * the sort key then skip whole files/row-groups via parquet min/max
   * statistics — the data-skipping layout a 100 TB fact table wants
   * for its dominant filter column.
   */
  def writeSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      targetPartitions: Int): Unit = {
    require(sortCols.nonEmpty, "writeSorted needs at least one sort column")
    import org.apache.spark.sql.functions.col
    val keys = sortCols.map(col)
    df.repartitionByRange(targetPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /**
   * Small-file compaction: rewrite a table directory into
   * ~`targetFileBytes` output files, sized from the source's actual
   * scan size. The streaming/incremental-ingest follow-up every large
   * deployment needs — thousands of tiny files turn scan planning and
   * open() overhead into the bottleneck. Reduction uses `coalesce`
   * (narrow — no shuffle); only growing the file count repartitions.
   * The rewrite goes through a sibling temp dir then swaps, so the
   * source is never read and truncated at once.
   */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet"): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val df = spark.read.format(format).load(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes // BigInt
    val nFiles = ((bytes + targetFileBytes - 1) / targetFileBytes)
      .max(BigInt(1)).min(BigInt(Int.MaxValue)).toInt
    val cur = df.rdd.getNumPartitions
    val out = if (nFiles < cur) df.coalesce(nFiles) else df.repartition(nFiles)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    out.write.mode(SaveMode.Overwrite).format(format).save(tmp)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hTmp = new org.apache.hadoop.fs.Path(tmp)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hPath, true)
    if (!fs.rename(hTmp, hPath))
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed")
  }
}
