package graft.schema

import org.apache.spark.sql.types._
import scala.collection.mutable.ListBuffer

/**
 * Fluent schema builder — the Spark `StructType` equivalent of the
 * reference's BigQuery `FieldSchemaListBuilder` (reference:
 * src/main/java/com/google/cloud/bqetl/mbschema/FieldSchemaListBuilder.java).
 *
 * BigQuery type mapping: INTEGER→LongType, STRING→StringType,
 * BOOLEAN→BooleanType, TIMESTAMP→TimestampType, RECORD→StructType,
 * mode REPEATED→ArrayType(...).
 */
final class SchemaBuilder {
  private val fields = ListBuffer.empty[StructField]

  private def add(name: String, t: DataType, nullable: Boolean): SchemaBuilder = {
    fields += StructField(name, t, nullable); this
  }

  def intField(name: String, nullable: Boolean = true): SchemaBuilder =
    add(name, LongType, nullable)
  def stringField(name: String, nullable: Boolean = true): SchemaBuilder =
    add(name, StringType, nullable)
  def boolField(name: String, nullable: Boolean = true): SchemaBuilder =
    add(name, BooleanType, nullable)
  def timestampField(name: String, nullable: Boolean = true): SchemaBuilder =
    add(name, TimestampType, nullable)
  def doubleField(name: String, nullable: Boolean = true): SchemaBuilder =
    add(name, DoubleType, nullable)

  /** Add an already-built field (e.g. the result of repeatedRecord). */
  def field(f: StructField): SchemaBuilder = { fields += f; this }

  /** This builder's fields as a REPEATED RECORD field — i.e. an
   * ArrayType of StructType (FieldSchemaListBuilder.repeatedRecord). */
  def repeatedRecord(name: String): StructField =
    StructField(name, ArrayType(StructType(fields.toSeq), containsNull = false), nullable = true)

  /** This builder's fields as a single nested RECORD field. */
  def record(name: String): StructField =
    StructField(name, StructType(fields.toSeq), nullable = true)

  def schema(): StructType = StructType(fields.toSeq)
}

object SchemaBuilder {
  def create(): SchemaBuilder = new SchemaBuilder
}
