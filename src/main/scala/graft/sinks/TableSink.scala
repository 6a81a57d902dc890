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
   * Small-file compaction: rewrite an UNPARTITIONED table directory
   * into ~`targetFileBytes` output files, sized from the source's
   * actual scan size. The streaming/incremental-ingest follow-up
   * every large deployment needs — thousands of tiny files turn scan
   * planning and open() overhead into the bottleneck.
   *
   * - Hive-partitioned (`col=value`) layouts are REJECTED: a blind
   *   rewrite would flatten the directories (losing partition pruning)
   *   and bake inferred partition types into the data. Compact each
   *   partition directory individually instead.
   * - Already-compacted input (file count at or below the target) is
   *   a no-op — a scheduled compaction cycle must not rewrite the
   *   whole table every run.
   * - Reduction is `coalesce` (narrow — no shuffle).
   * - The swap is rename-based: rewrite to `...__compact_tmp`, move
   *   the original to `...__compact_bak`, move tmp into place (rolled
   *   back on failure), drop the backup. Not atomic on stores without
   *   atomic directory rename — a crash between the renames leaves
   *   the data intact in the bak/tmp siblings for manual recovery,
   *   never deleted-and-gone.
   */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet"): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(hPath)
    if (entries.exists(e => e.isDirectory && e.getPath.getName.contains("=")))
      throw new IllegalArgumentException(
        s"compact: $path is Hive-partitioned; compact each partition directory instead")
    val curFiles = entries.count(e => e.isFile &&
      !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
    val df = spark.read.format(format).load(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes // BigInt
    val nFiles = ((bytes + targetFileBytes - 1) / targetFileBytes)
      .max(BigInt(1)).min(BigInt(Int.MaxValue)).toInt
    if (nFiles >= curFiles) return // nothing to merge
    val tmp = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_bak")
    df.coalesce(nFiles).write.mode(SaveMode.Overwrite).format(format).save(tmp.toString)
    if (!fs.rename(hPath, bak))
      throw new java.io.IOException(s"compact: rename $path -> $bak failed")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(bak, hPath) // roll back; original untouched
      throw new java.io.IOException(s"compact: rename $tmp -> $path failed (rolled back)")
    }
    fs.delete(bak, true) // best effort; leftover bak is harmless
  }
}
