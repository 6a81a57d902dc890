package graft

import org.apache.spark.sql.SparkSession

/** Plan-review main: print the formatted physical plan of the named
  * queries (or all) so pushdown/broadcast/shuffle shape can be
  * audited. Usage: runMain graft.Explain [sfDir] [query...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("8")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
