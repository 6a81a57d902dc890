package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's relational ETL core, re-expressed as declarative
 * Spark plans (reference:
 * src/main/java/com/google/cloud/bqetl/mbdata/MusicBrainzTransforms.java).
 *
 * Scale design: every operator here stays inside Catalyst — joins are
 * planned (broadcast for the small side, sort-merge otherwise, AQE can
 * re-plan at runtime), lookups are explicit broadcasts (the Beam
 * side-input pattern IS Spark's broadcast hash join), and nesting is a
 * single hash-aggregate shuffle with the post-processing (chunking)
 * kept narrow. No driver-side loops, no collect().
 */
object Relational {

  /**
   * Key a namespaced DataFrame by a column — the reference's `by()`
   * (MusicBrainzTransforms.java:66-80). In Spark the keying is
   * logical: downstream joins/aggregations shuffle on whatever key
   * they declare, so this just projects `(key, value-struct)` for
   * callers that want the KV shape explicitly.
   */
  def keyBy(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).as("key"), struct(df.columns.map(col).toIndexedSeq: _*).as("value"))

  /**
   * Inner join of two namespaced tables, merging both column sets —
   * the reference's `innerJoin()` + column-merge
   * (MusicBrainzTransforms.java:109-137). Column namespacing keeps the
   * merged set disjoint, so this is a plain Catalyst inner join: the
   * CoGroupByKey + nested-loop merge of the reference becomes a
   * planned sort-merge or broadcast join and the "cartesian per key"
   * semantics are exactly inner-join semantics.
   */
  def innerJoinMerge(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "inner")

  /** One lookup mapping: replace each column in `destCols` (holding a
   * key of `mapping`'s key column) with the mapped label; unmatched
   * ids fall back to the id rendered as a string — the reference's
   * LookupDescription semantics (MusicBrainzTransforms.java:481-497:
   * `label == null → "" + id`). */
  final case class Lookup(mapping: DataFrame, keyCol: String, valueCol: String, destCols: Seq[String])

  /**
   * Apply broadcast lookups to `df` — the reference's side-input map
   * join (MusicBrainzTransforms.java:402-507). Each lookup table is
   * broadcast (they are small dimension tables by construction) so the
   * replacement is a map-side hash probe: zero extra shuffles
   * regardless of how many lookups are applied.
   */
  def lookupReplace(df: DataFrame, lookups: Lookup*): DataFrame =
    lookups.foldLeft(df) { (acc, lk) =>
      lk.destCols.foldLeft(acc) { (cur, dest) =>
        // distinct key→value projection, broadcast; join on the dest col.
        // The dedup mirrors the reference's side-input Map (one value
        // per key): without it a duplicate-keyed lookup table would
        // multiply fact rows. The reference's map is last-insert-wins
        // (deterministic given file order); Spark has no stable row
        // order after a shuffle, so we pick max(value) — a commutative
        // reduction that yields the SAME winner on every run and every
        // partitioning.
        val m = lk.mapping
          .select(col(lk.keyCol).as(s"__lk_key"), col(lk.valueCol).cast("string").as(s"__lk_val"))
          .groupBy("__lk_key")
          .agg(max("__lk_val").as("__lk_val"))
        val joined = cur.join(broadcast(m), cur(dest) === m("__lk_key"), "left")
        val replaced = coalesce(col("__lk_val"), col(dest).cast("string")).as(dest)
        val outCols = cur.columns.map(c => if (c == dest) replaced else col(c))
        joined.select(outCols.toIndexedSeq: _*)
      }
    }

  /**
   * Nest `child` rows under `parent` as a repeated-record column — the
   * reference's `nest()` (MusicBrainzTransforms.java:147-170).
   *
   * One hash-aggregate shuffle builds the per-key child arrays; the
   * parent join is then planned normally (broadcast if the aggregated
   * side is small). Parents with no children get an empty array (the
   * reference emits an empty child list); child keys with no parent
   * are dropped when `inner=true` (the reference's getOnly() would
   * throw there, so inner is the faithful mode; outer keeps all
   * parents).
   *
   * `sortChildBy` makes the array order deterministic (the reference
   * inherits GroupByKey's arbitrary order; determinism matters for
   * our oracle checks and for stable output at scale).
   */
  def nest(
      parent: DataFrame,
      child: DataFrame,
      parentKey: String,
      childKey: String,
      nestedCol: String,
      inner: Boolean = false,
      sortChildBy: Seq[String] = Nil): DataFrame = {
    val childCols = child.columns
    val orderCols = if (sortChildBy.nonEmpty) sortChildBy else childCols.toSeq
    // Put the sort columns first in the struct so natural (field-order
    // lexicographic) struct comparison sorts by them.
    val structCols = (orderCols ++ childCols.filterNot(orderCols.contains)).distinct
    // Native compiled comparator when every field is a flat comparable
    // type (the common case) — array_sort evaluates an interpreted
    // lambda per comparison, which dominates nest cost on wide
    // children (~4× end-to-end). Same total order either way.
    val flatComparable = structCols.forall { c =>
      import org.apache.spark.sql.types._
      child.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
             StringType | BooleanType | DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
    def sorted(c: Column): Column =
      if (flatComparable) graft.functions.expressions.sortStructArray(c) else array_sort(c)
    val agg = child
      .groupBy(col(childKey).as("__nest_key"))
      .agg(sorted(collect_list(struct(structCols.map(col).toIndexedSeq: _*))).as(nestedCol))
    val joined = parent.join(agg, parent(parentKey) === agg("__nest_key"), if (inner) "inner" else "left")
    val arr =
      if (inner) col(nestedCol)
      else coalesce(col(nestedCol), array().cast(agg.schema(nestedCol).dataType))
    joined.select((parent.columns.map(parent(_)) :+ arr.as(nestedCol)).toIndexedSeq: _*)
  }

  /**
   * Project a DataFrame onto a target schema — the reference's
   * `transformToTableRows` (MusicBrainzTransforms.java:203-282): only
   * schema fields are emitted, each cast to the schema type, and any
   * repeated-record (array) field is chunked at `nestingLimit`,
   * splitting overflow into duplicate rows. Missing fields become
   * typed nulls (the reference skips absent values).
   */
  def conformToSchema(
      df: DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      nestingLimit: Int = 1000): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val present = df.columns.toSet
    val projected = df.select(schema.fields.map { f =>
      val out =
        if (!present.contains(f.name)) lit(null).cast(f.dataType)
        else (f.dataType, df.schema(f.name).dataType) match {
          // narrowing an array of structs is an element-wise projection,
          // not a cast (Spark rejects subset-struct casts)
          case (ArrayType(target: StructType, _), ArrayType(src: StructType, _)) =>
            val srcFields = src.fieldNames.toSet
            transform(col(f.name), e => struct(target.fields.map { tf =>
              (if (srcFields.contains(tf.name)) e.getField(tf.name).cast(tf.dataType)
               else lit(null).cast(tf.dataType)).as(tf.name)
            }.toIndexedSeq: _*))
          case _ => col(f.name).cast(f.dataType)
        }
      out.as(f.name)
    }.toIndexedSeq: _*)
    val arrayCols = schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] => f.name
    }.toSeq
    nestChunkedAll(projected, arrayCols, nestingLimit)
  }

  /**
   * Chunk several repeated-record columns in LOCKSTEP (one shared
   * chunk index sliced into every array) — the reference's
   * toTableRows walks all nested lists together
   * (MusicBrainzTransforms.java:256-276), so two arrays of 7 and 5 at
   * limit 3 yield 3 rows of (3,3)/(3,2)/(1,0) — NOT the cross-product
   * that independent per-column chunking would produce.
   */
  def nestChunkedAll(df: DataFrame, arrayCols: Seq[String], limit: Int): DataFrame = {
    require(limit > 0, "nesting limit must be positive")
    if (arrayCols.isEmpty) return df
    if (arrayCols.size == 1) return nestChunked(df, arrayCols.head, limit)
    val maxSize = arrayCols.map(c => size(col(c))).reduce((a, b) => greatest(a, b))
    val nChunks = greatest(ceil(maxSize.cast("double") / limit).cast("int"), lit(1))
    val others = df.columns.filterNot(arrayCols.contains).map(col)
    val sliced = arrayCols.map(c =>
      slice(col(c), col("__chunk") * limit + 1, lit(limit)).as(c))
    df.withColumn("__chunk", explode(sequence(lit(0), nChunks - 1)))
      .select((others ++ sliced).toIndexedSeq: _*)
  }

  /**
   * Enforce a nesting limit by splitting rows whose repeated-record
   * column exceeds `limit` elements into duplicate parent rows of at
   * most `limit` children each — the reference's
   * BIGQUERY_NESTING_LIMIT row-splitting (MusicBrainzTransforms.java:
   * 224-282, limit 1000).
   *
   * Narrow ops only (sequence → explode → slice): no extra shuffle
   * after the nest aggregation, and the explode is distributed, unlike
   * the reference's per-element driver loop.
   */
  def nestChunked(nested: DataFrame, nestedCol: String, limit: Int): DataFrame = {
    require(limit > 0, "nesting limit must be positive")
    val n = size(col(nestedCol))
    val nChunks = greatest(ceil(n.cast("double") / limit).cast("int"), lit(1))
    val others = nested.columns.filterNot(_ == nestedCol).map(col)
    nested
      .withColumn("__chunk", explode(sequence(lit(0), nChunks - 1)))
      .select((others :+ slice(col(nestedCol), col("__chunk") * limit + 1, lit(limit)).as(nestedCol)).toIndexedSeq: _*)
  }
}
