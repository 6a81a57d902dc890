package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Every artifact is self-describing: after a query's parquet is written,
  * the files are re-read (proving a complete, readable artifact) and a
  * `_meta.json` sidecar is written INTO the query dir recording
  * {sf_dir, rows, sha256 per parquet part}. Spark and the driver's
  * `*.parquet` glob both ignore underscore files. A downstream red row
  * can then be traced: if the compared artifact still matches its
  * sidecar hashes, it is byte-identical to what Verify wrote and the
  * divergence is in the compare; if not, the artifact was stale or
  * swapped after the fact — the CORRECTNESS_r07/r08 false-negative class
  * for q_date_spine/q_salted_join, the only two queries whose row counts
  * are scale-factor-invariant (2405 spine days, 5 market segments at
  * every SF), so a wrong-SF artifact passes the row check and fails only
  * the value hash. tools/check_oracle.py cross-checks the sidecars. */
object Verify {

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }

  private def sha256(p: java.nio.file.Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  /** A dir we may wipe or write into: absent/empty, or carrying a marker
    * a previous Verify run wrote. Refuses to recurse-delete an arbitrary
    * mistyped path (ADVICE r8). */
  private def wipeSafe(dir: java.io.File): Boolean = {
    val entries = Option(dir.listFiles()).getOrElse(Array.empty)
    !dir.exists() || entries.isEmpty ||
      entries.exists(f => f.getName == "verify_manifest.json" || f.getName == "oracle_sql.json")
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args = subset of query names (fast local
    // iteration); unknown names error rather than silently vanish
    val unknown = args.drop(2).toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.toSeq.sorted.mkString(", ")}")
    // SPARK_GRAFT_VERIFY_EXCLUDE (comma-separated; the Bench exclude
    // convention): drop named queries from a FULL run — the sf1
    // correctness sweep excludes the O(n²)-by-design brute-force
    // oracle baselines exactly as BENCH_sf1 does, and the exclusion
    // must be loud and name-checked, never a silent filter.
    val excluded = sys.env.get("SPARK_GRAFT_VERIFY_EXCLUDE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val unknownEx = excluded.diff(SparkEntry.queries.keySet)
    require(unknownEx.isEmpty,
      s"unknown exclude names: ${unknownEx.toSeq.sorted.mkString(", ")}")
    if (excluded.nonEmpty)
      System.err.println(s"[verify] EXCLUDED ${excluded.size} queries: " +
        excluded.toSeq.sorted.mkString(", "))
    val subset = args.length > 2
    val selected =
      (if (subset) SparkEntry.queries.view.filterKeys(args.drop(2).toSet).toMap
       else SparkEntry.queries).view.filterKeys(!excluded.contains(_)).toMap
    val out = new java.io.File(outDir)
    require(wipeSafe(out),
      s"refusing to touch non-empty dir without a verify marker: $outDir")
    if (subset) {
      // Subset mode: wipe ONLY the selected queries' subdirectories so a
      // fast local iteration never destroys the other queries' verified
      // artifacts (ADVICE r8).
      selected.keys.foreach(n => deleteTree(new java.io.File(out, n)))
    } else {
      // Full mode: the out dir is wiped BEFORE any query runs — per-query
      // dirs from a previous (aborted, or different-scale-factor) run
      // must never survive into this run's compare. mode("overwrite")
      // alone leaves a stale parquet in place whenever THIS run's query
      // fails, and the driver's DuckDB diff would then score old results
      // as current.
      deleteTree(out)
    }
    out.mkdirs()
    val spark = Sessions.local()
    val status = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Provenance self-check: re-read what was just written (a partial
        // or corrupt artifact fails here, not in the driver's compare)
        // and fingerprint the bytes into the sidecar.
        val rows = spark.read.parquet(s"$outDir/$name").count()
        val dir = Paths.get(outDir, name)
        val parts = Files.list(dir).iterator()
        val hashes = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        while (parts.hasNext) {
          val p = parts.next()
          val n = p.getFileName.toString
          if (n.endsWith(".parquet")) hashes += ((n, sha256(p)))
        }
        val fileJson =
          hashes.sortBy(_._1).map { case (f, h) => s"${q(f)}: ${q(h)}" }.mkString("{", ",", "}")
        Files.writeString(dir.resolve("_meta.json"),
          s"""{"sf_dir": ${q(sfDir)}, "rows": $rows, "files": $fileJson}""")
        name -> None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        name -> Some(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    // Run-level manifest: scale factor, which queries ran, which failed.
    // A failed query has NO parquet dir (the wipe above guarantees it),
    // so a compare that finds one missing consults this file instead of
    // guessing. Per-artifact provenance lives in each dir's _meta.json.
    val manifest =
      s"""{"sf_dir": ${q(sfDir)}, "subset": $subset, "n_queries": ${status.size}, """ +
      s""""wall_ms": ${System.currentTimeMillis()}, """ +
      s""""ran": ${status.map(s => q(s._1)).mkString("[", ",", "]")}, """ +
      s""""failed": ${status.collect { case (n, Some(_)) => q(n) }.mkString("[", ",", "]")}, """ +
      s""""errors": ${status.collect { case (n, Some(e)) => s"${q(n)}: ${q(e)}" }.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), manifest)
    val json = SparkEntry.oracleSql.view.filterKeys(selected.keySet)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the COMPLETE oracle map, regardless of subset: a sweep resumed
    // across several subset runs (the sf1 correctness sweep) compares
    // against this one instead of whichever subset wrote last
    val full = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql_full.json"), full)
    spark.stop()
  }
}
