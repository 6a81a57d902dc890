package graft

import org.apache.spark.sql.functions._

/** r19 optimization-session stage probes (ad-hoc; not part of the
  * driver contract). Usage: runMain graft.OptProbe [sfDir] [probe]. */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).headOption.getOrElse("linkage")
    val spark = Sessions.local()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    which match {
      case "linkage" =>
        val recs = Tables.table(spark, dir, "customer").withColumn("ident",
          concat(col("c_name"), lit("|"), col("c_mktsegment"),
            col("c_nationkey").cast("string")))
        val base = recs.select(col("c_custkey").cast("long").as("id"),
          col("ident").as("s"))
        val names = base.select(col("s")).distinct()
        val keys = names.select(col("s"),
          explode(graft.functions.expressions
            .deletionNeighborhoodHashed(col("s"), 2)).as("k"))
          .hint("shuffle_merge")
        // warmups then stages
        for (i <- 1 to 2) {
          time(s"[$i] keys explode only")(noop(keys))
          val namePairs = keys.as("a").join(keys.as("b"),
              col("a.k") === col("b.k") && col("a.s") < col("b.s"))
            .select(col("a.s").as("s1"), col("b.s").as("s2"))
          time(s"[$i] key self-join (pre-distinct)")(noop(namePairs))
          val nd = namePairs.distinct()
          time(s"[$i] + distinct")(noop(nd))
          val verified = nd.withColumn("dist",
              levenshtein(col("s1"), col("s2"), 2).cast("long"))
            .filter(col("dist") >= 1L)
          time(s"[$i] + verify")(noop(verified))
          time(s"[$i] full query")(noop(
            SparkEntry.queries("q_record_linkage_del2")(spark, dir)))
        }
      case _ => ()
    }
    spark.stop()
  }
}
