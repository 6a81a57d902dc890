package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probes for the heavy paths. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val customer = Tables.table(spark, dir, "customer")
    val orders   = Tables.table(spark, dir, "orders")
    val lineitem = Tables.table(spark, dir, "lineitem")
    val items    = Relational.innerJoinMerge(orders, lineitem, "o_orderkey", "l_orderkey")

    // nest WITHOUT array_sort (collect_list only)
    time("nest-unsorted") {
      noop(customer.join(
        items.groupBy(col("o_custkey").as("k"))
          .agg(collect_list(struct(items.columns.map(col).toIndexedSeq: _*)).as("arr")),
        col("c_custkey") === col("k"), "left"))
    }
    // nest WITH array_sort (current operator)
    time("nest-sorted") {
      noop(Relational.nest(customer, items, "c_custkey", "o_custkey", "order_items",
        sortChildBy = Seq("o_orderkey", "l_linenumber")))
    }
    // full q_nested_denorm query as shipped
    time("q_nested_denorm") {
      noop(SparkEntry.queries("q_nested_denorm")(spark, dir))
    }
    spark.stop()
  }
}
