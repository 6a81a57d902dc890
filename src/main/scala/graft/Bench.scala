package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the sf dir given by
  * SPARK_GRAFT_SF_DIR and prints one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // noop sink materializes every output row+column — count() would let
    // Catalyst prune joins/sorts the query actually pays for in production
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // Full untimed warmup pass: JIT + Janino codegen compilation cost
    // ~8-10s and lands on whichever query first exercises each code
    // path (a cold-JVM first query measures the compiler, not the
    // query). The timed pass below then measures steady-state
    // throughput — the regime a long-lived production session runs in.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => () } }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      // -1 marks a failed query — a crash must not read as a fast success
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers successful queries only — failure sentinels (-1)
    // must not subtract from the headline metric
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
