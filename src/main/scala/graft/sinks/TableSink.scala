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
}
