package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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
    // optional args = query names to probe in isolation (contention
    // triage: a query slow in the full run but fast alone is load, not
    // code); no args = the full driver-facing sweep. Unknown names are
    // an ERROR — silently filtering a typo would yield an empty sweep
    // that reads as a clean run.
    val unknown = args.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.toSeq.sorted.mkString(", ")}")
    // SPARK_GRAFT_BENCH_EXCLUDE: comma-separated names to SKIP — for
    // the sf1 scale sweep, where the brute-force oracle-baseline twins
    // (O(n²) by design, they exist to verify the scale path at oracle
    // SF) would dominate the wall clock. Logged loudly: a silent cap
    // would read as "covered everything".
    val excluded = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val unknownEx = excluded.diff(SparkEntry.queries.keySet)
    require(unknownEx.isEmpty,
      s"unknown exclude names: ${unknownEx.toSeq.sorted.mkString(", ")}")
    if (excluded.nonEmpty)
      System.err.println(s"[bench] EXCLUDED ${excluded.size} queries: " +
        excluded.toSeq.sorted.mkString(", "))
    val selected =
      (if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.toSet).toMap
       else SparkEntry.queries).view.filterKeys(!excluded.contains(_)).toMap
    // SPARK_GRAFT_BENCH_PASSES=1: single timed pass, no warmup — the
    // scale-sweep mode, where each query runs long enough to amortize
    // JIT/codegen compilation and a 3-pass protocol would triple an
    // already ~hour-long run. Default (unset) = warmup + min-of-2,
    // the noise-controlled protocol BENCH_BASELINE.json is pinned on.
    val singlePass = sys.env.get("SPARK_GRAFT_BENCH_PASSES").contains("1")
    val ordered = selected.toSeq.sortBy(_._1)
    if (!singlePass)
      ordered.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => () } }
    // Per-query time = MIN of two timed runs. The shared host stalls
    // randomly (documented 2-5×, and BENCH_r07 recorded 10-100× windows
    // hitting alphabetically-consecutive queries); a stall is a
    // one-sided error, so min-of-2 is self-healing unless BOTH runs of
    // the same query land in stall windows — and the second pass runs
    // a full sweep later in time, decorrelating the two samples.
    def timedOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      // -1 marks a failed query — a crash must not read as a fast success
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val pass1 = ordered.map { case (name, fn) => name -> timedOnce(name, fn) }.toMap
    val results =
      if (singlePass) ordered.map { case (name, _) => name -> pass1(name) }
      else ordered.map { case (name, fn) =>
        val t2 = timedOnce(name, fn)
        val t1 = pass1(name)
        name -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
      }
    // Per-query times as INTEGER MILLISECONDS — shortest stable encoding
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v >= 0) math.round(v * 1000) else -1L)
    }.mkString("{", ",", "}")
    // total covers successful queries only — failure sentinels (-1)
    // must not subtract from the headline metric
    val total = results.map(_._2).filter(_ >= 0).sum
    // Double.toString of a pre-rounded value is locale-independent;
    // f"...%.2f" would emit "97,73" under a comma-decimal locale and
    // corrupt the JSON
    val totalStr = (math.round(total * 100) / 100.0).toString
    // "0.1" from ".../sf0.1"; fall back to the quoted dir if not numeric
    val sf = sfDir.replaceAll(".*sf", "").toDoubleOption
      .map(_.toString).getOrElse("\"" + sfDir + "\"")
    val full =
      s"""{"metric":"total","value":$totalStr,"unit":"sec","queries_unit":"ms","queries":$qs,"sf":$sf}"""
    // The harness keeps only a ~2000-char tail of this process' output,
    // which a 90-query map overflows as queries accrue — persist the
    // complete per-query record as a repo artifact...
    Files.write(Paths.get("bench_full.json"),
      (full + "\n").getBytes(StandardCharsets.UTF_8))
    // ...AND as an IMMUTABLE per-configuration file (r20, VERDICT r19
    // evidence gap): the driver runs this bench at two core counts and
    // each run of the shared `bench_full.json` clobbers the previous
    // run's per-query map — r19's per-query comparison and scaling
    // block came back empty because the 8-core run overwrote the
    // 32-core map. A file keyed by (cpus, sf) is stable across the
    // driver's runs, so both maps survive. `bench_full.json` stays for
    // compatibility; the total line and env handling are unchanged.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfTag = sfDir.replaceAll(".*sf", "").replaceAll("[^0-9.]", "")
    val runFile = s"bench_full_c${cpus}_sf$sfTag.json"
    Files.write(Paths.get(runFile),
      (full + "\n").getBytes(StandardCharsets.UTF_8))
    // ...print the full line for human readers (truncation only costs
    // its head), and END with a short summary line that always fits the
    // tail whole. stdout passes through raw (build.sbt outputStrategy),
    // so the last line is prefix-free parseable JSON. queries_file
    // names the immutable per-run artifact (r20) so a consumer of the
    // tail line finds the map that belongs to THIS run.
    println(full)
    if (full.length > 1800)
      println(s"""{"metric":"total","value":$totalStr,"unit":"sec","sf":$sf,""" +
        s""""n_queries":${results.size},"queries_file":"$runFile"}""")
    spark.stop()
  }
}
