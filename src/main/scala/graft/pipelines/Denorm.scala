package graft.pipelines

import graft.Tables
import graft.operators.Relational
import graft.operators.Relational.Lookup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's two end-to-end pipelines, re-expressed on the
 * driver's star schema.
 *
 * - [[flatDenorm]] is BQETLSimple (reference:
 *   src/main/java/com/google/cloud/bqetl/BQETLSimple.java:47-124):
 *   dimension lookups applied to the parent, then a two-hop inner
 *   join producing a flat, denormalized wide table that repeats
 *   parent data per child row.
 * - [[nestedDenorm]] is BQETLNested (reference:
 *   src/main/java/com/google/cloud/bqetl/BQETLNested.java:36-96):
 *   the child-side join happens first, then the joined children are
 *   nested under the parent as a repeated record.
 *
 * Scale: the nation lookup is broadcast (no shuffle); the
 * orders⋈lineitem / customer⋈orders joins shuffle on their keys once
 * each and AQE can coalesce/skew-split at runtime. At 100 TB the spine
 * would additionally benefit from bucketing both fact tables on the
 * join key at write time — the operators here don't preclude that.
 */
object Denorm {

  /** Flat denormalization (BQETLSimple): customer (with nation-name
   * lookup when `performLookups`, mirroring the reference's
   * --performLookups option, BQETLOptions.java) ⋈ orders ⋈ lineitem. */
  def flatDenorm(spark: SparkSession, dir: String, performLookups: Boolean = true): DataFrame = {
    val base = Tables.table(spark, dir, "customer")
    val customer =
      if (performLookups)
        Relational.lookupReplace(base,
          Lookup(Tables.table(spark, dir, "nation"), "n_nationkey", "n_name", Seq("c_nationkey")))
      else base
    val orders   = Tables.table(spark, dir, "orders")
    val lineitem = Tables.table(spark, dir, "lineitem")
    val co  = Relational.innerJoinMerge(customer, orders, "c_custkey", "o_custkey")
    Relational.innerJoinMerge(co, lineitem, "o_orderkey", "l_orderkey")
  }

  /** Nested denormalization (BQETLNested): (orders ⋈ lineitem) nested
   * under customer as a repeated record column `order_items`. */
  def nestedDenorm(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.table(spark, dir, "customer")
    val orders   = Tables.table(spark, dir, "orders")
    val lineitem = Tables.table(spark, dir, "lineitem")
    val items    = Relational.innerJoinMerge(orders, lineitem, "o_orderkey", "l_orderkey")
      // revenue in exact cents·cents space, computed codegen'd BEFORE
      // nesting — array lambdas over nested structs run interpreted,
      // so per-item arithmetic must not live there
      .withColumn("l_rev_cents",
        (round(col("l_extendedprice") * 100, 0).cast("long") *
         round((lit(1.0) - col("l_discount")) * 100, 0).cast("long")))
    Relational.nest(customer, items, "c_custkey", "o_custkey", "order_items",
      sortChildBy = Seq("o_orderkey", "l_linenumber"))
  }
}
