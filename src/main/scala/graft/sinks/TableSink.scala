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
  /**
   * Keyed upsert (MERGE ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
   * INSERT, SCD-1): rows in `delta` replace current rows with the same
   * key; unmatched current rows are kept; unmatched delta rows are
   * inserted. The incremental companion to the reference's
   * truncate-and-load (BQETLSimple.java:113-120) — a recurring ETL
   * that reloads only changed source rows needs this, not a full
   * rewrite.
   *
   * - One anti join on the key: current-side shuffle only; a small
   *   delta broadcasts (AQE picks it from size), so the common
   *   trickle-update case never shuffles the big table.
   * - `delta` must be unique per key — which row of a duplicate pair
   *   wins would otherwise be partition-order nondeterminism. Checked
   *   with one cheap aggregation over delta (skippable via
   *   `checkUniqueKeys = false` when the producer guarantees it).
   * - Schema evolution, additive only: a delta column the table lacks
   *   is ADDED (existing rows null-filled) — the first new attribute a
   *   daily feed grows must not abort the MERGE. A type change on a
   *   shared column, or a delta that DROPS a table column, still fails
   *   loudly: both silently rewrite history (coerced values / vanished
   *   data) instead of appending to it.
   * - Same crash-safe rename swap as `compact`: the merged result is
   *   fully written to a `__upsert_tmp` sibling before the target
   *   moves, so a crash never leaves a half-table.
   */
  def upsert(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      delta: DataFrame,
      keyCols: Seq[String],
      format: String = "parquet",
      checkUniqueKeys: Boolean = true): Unit = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    if (checkUniqueKeys) {
      import org.apache.spark.sql.functions.{count, lit}
      val dup = delta.groupBy(keyCols.map(delta(_)): _*)
        .agg(count(lit(1)).as("__n")).filter("__n > 1").limit(1).count()
      require(dup == 0, s"upsert: delta has duplicate keys on ${keyCols.mkString(",")}")
    }
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) {
      delta.write.mode(SaveMode.ErrorIfExists).format(format).save(path)
      return
    }
    // Hive-partitioned layouts are REJECTED for the same reason as
    // compact: load() would infer the partition columns and the merged
    // rewrite (no partitionBy) would silently flatten the directory
    // layout — losing partition pruning and baking inferred
    // partition-column types into the data files.
    if (fs.listStatus(hPath).exists(e =>
        e.isDirectory && e.getPath.getName.contains("=")))
      throw new IllegalArgumentException(
        s"upsert: $path is Hive-partitioned; upsert per partition directory instead")
    val current = spark.read.format(format).load(path)
    // Shared columns: name AND type equality — unionByName would
    // otherwise coerce silently (int delta vs bigint table rewrites the
    // whole table with changed column types instead of failing loudly).
    val currentTypes = current.dtypes.toMap
    val deltaTypes = delta.dtypes.toMap
    val typeChanged = currentTypes.keySet.intersect(deltaTypes.keySet).toSeq.sorted
      .collect { case c if currentTypes(c) != deltaTypes(c) =>
        s"$c: ${currentTypes(c)} -> ${deltaTypes(c)}" }
    require(typeChanged.isEmpty,
      s"upsert: column type changes refused (rewrite the table explicitly): " +
        typeChanged.mkString("; "))
    val dropped = (currentTypes.keySet -- deltaTypes.keySet).toSeq.sorted
    require(dropped.isEmpty,
      s"upsert: delta is missing table columns ${dropped.mkString(",")}; " +
        "dropping columns is not additive evolution")
    // Additive evolution: null-fill the new columns on the existing
    // rows so the merged table carries the widened schema.
    import org.apache.spark.sql.functions.lit
    val newCols = delta.schema.fields.filterNot(f => currentTypes.contains(f.name))
    val evolved = newCols.foldLeft(current) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val merged = evolved
      .join(delta.select(keyCols.map(delta(_)): _*), keyCols, "left_anti")
      .unionByName(delta)
    val tmp = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__upsert_tmp")
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__upsert_bak")
    merged.write.mode(SaveMode.Overwrite).format(format).save(tmp.toString)
    if (!fs.rename(hPath, bak))
      throw new java.io.IOException(s"upsert: rename $path -> $bak failed")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(bak, hPath) // roll back; original untouched
      throw new java.io.IOException(s"upsert: rename $tmp -> $path failed (rolled back)")
    }
    fs.delete(bak, true) // best effort; leftover bak is harmless
  }

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
