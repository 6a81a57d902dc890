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

    // B84 interpolate stage costs: the daily rollup alone, the spine
    // join without windows, and the shipped operator (running +
    // unbounded-following frames) — isolates where the time goes.
    {
      val nation = Tables.table(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val daily = orders.select(col("o_custkey"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
            .cast("long").as("d"),
          round(col("o_totalprice") * 100, 0).cast("long").as("rev_cents"))
        .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "d").agg(sum("rev_cents").as("rev_cents"))
      time("interp: daily rollup only")(noop(daily))
      val span = daily.groupBy("n_name")
        .agg(min("d").as("p0"), max("d").as("p1"))
        .select(col("n_name"), explode(sequence(col("p0"), col("p1"))).as("d"))
      time("interp: spine + left join, no windows") {
        noop(span.join(daily, Seq("n_name", "d"), "left"))
      }
      time("interp: shipped linearFill") {
        noop(graft.operators.Interpolate.linearFill(daily, Seq("n_name"), "d", "rev_cents"))
      }
    }
    spark.stop()
  }
}
