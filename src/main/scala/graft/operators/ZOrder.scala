package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data clustering for multi-dimensional file
 * skipping.
 *
 * A 100 TB table sorted on ONE key prunes scans on that key only:
 * parquet min/max footers for every other column span the full domain
 * in every file. Interleaving the bits of two keys into a single
 * z-value and range-writing on it gives every file a tight bounding
 * BOX over both keys, so a predicate on either one (or both) skips
 * most files from footer stats alone — the layout trick behind
 * Delta/Iceberg OPTIMIZE ZORDER, here as a plain parquet write.
 *
 * The z-value is pure bit arithmetic over built-in expressions
 * (shiftleft/and/or), so it is codegen'd, engine-portable (the DuckDB
 * oracle evaluates the identical formula), and usable as a clustering,
 * bucketing, or range-partition key anywhere a Column fits.
 */
object ZOrder {

  /** Bits per dimension; two spread 16-bit keys interleave into a
   * 32-bit z-value, plenty for file-level clustering (a 100 TB table
   * at 1 GB files is ~10^5 files — 2^32 cells over-resolves it). */
  val Bits = 16

  /** Spread the low 16 bits of x so bit i lands at bit 2i: the
   * standard 4-step magic-mask dilation, all codegen'd built-ins. */
  private[operators] def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two keys already scaled into [0, 2^16): x takes
   * the even bits, y the odd. */
  def zvalue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scale an arbitrary numeric column into [0, 2^16) given its
   * domain bounds — rank-free, so it costs no extra pass or shuffle
   * (bounds come from table stats or domain knowledge; mild skew only
   * blurs locality, never correctness). */
  def scaleTo16(c: Column, min: Column, max: Column): Column =
    // constant column (min == max) short-circuits to 0: the division
    // would yield NaN, which ANSI mode refuses to cast to long
    when(max === min, lit(0L)).otherwise(
      least(lit((1L << Bits) - 1), greatest(lit(0L),
        ((c - min).cast("double") / (max - min).cast("double") * ((1L << Bits) - 1))
          .cast("long"))))

  /** Cluster `df` on the z-curve of two pre-scaled keys and write
   * parquet: one range exchange on the z-value (range partitioning
   * keeps curve-adjacent cells in the same file), sort within
   * partitions so parquet row-group stats are tight too, and emit
   * `numFiles` files. Readers need nothing special — predicates on
   * either key prune via ordinary min/max footer stats. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): Unit =
    df.withColumn("_z", zvalue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
