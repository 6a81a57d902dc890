package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Schema-on-read CSV-line parsing with malformed-record QUARANTINE.
 *
 * The reference's line reader drops unparseable input silently
 * (json/JSONReader.java:42-57 catches the parse exception and returns
 * null, so bad lines simply vanish from the PCollection). At 100 TB
 * that silence is a data-loss bug: a upstream export glitch that
 * mangles 0.1% of lines costs 100 GB of training data with no signal.
 * The Spark-first shape: parse in PERMISSIVE mode with a corrupt-record
 * column — good rows parse typed fields, bad rows keep their raw bytes
 * in the quarantine column — so the pipeline can both count/inspect the
 * damage and route quarantined lines to a dead-letter sink. Everything
 * stays codegen'd (`from_csv` is a native expression); no UDF, no
 * second pass.
 */
object CsvLines {

  /** Parse `lineCol` against `schema`; emits every schema field plus
   * `is_corrupt` (true when the line failed type/shape checks — its
   * unparsed fields are null) and `quarantine` (the raw line for
   * corrupt rows, null otherwise). */
  def parseWithQuarantine(df: DataFrame, lineCol: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "_corrupt is reserved for the quarantine column")
    val withCorrupt = schema.add("_corrupt", StringType, nullable = true)
    val parsed = from_csv(col(lineCol), withCorrupt,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))
    val fields: Seq[Column] =
      schema.fieldNames.toIndexedSeq.map(f => col("_p").getField(f).as(f))
    df.withColumn("_p", parsed)
      .select(df.columns.map(col).toIndexedSeq ++ fields ++ Seq(
        col("_p").getField("_corrupt").isNotNull.as("is_corrupt"),
        col("_p").getField("_corrupt").as("quarantine")): _*)
  }
}
