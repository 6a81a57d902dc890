package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args = subset of query names (fast local
    // iteration); unknown names error rather than silently vanish
    val unknown = args.drop(2).toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.toSeq.sorted.mkString(", ")}")
    val selected =
      if (args.length > 2) SparkEntry.queries.view.filterKeys(args.drop(2).toSet).toMap
      else SparkEntry.queries
    val spark = Sessions.local()
    // The out dir is wiped BEFORE any query runs: per-query dirs from a
    // previous (aborted, or different-scale-factor) run must never
    // survive into this run's compare — mode("overwrite") alone leaves
    // a stale parquet in place whenever THIS run's query fails, and the
    // driver's DuckDB diff would then score old results as current
    // (the exact false negative CORRECTNESS_r07 recorded for
    // q_date_spine: an sf0.01 artifact compared against the sf0.1
    // oracle).
    deleteTree(new java.io.File(outDir))
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val status = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        name -> None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        name -> Some(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    // Per-run manifest: which scale factor produced these artifacts and
    // which queries failed to write. A failed query has NO parquet dir
    // (the wipe above guarantees it), so a compare that finds one
    // missing can consult this file instead of guessing.
    val manifest =
      s"""{"sf_dir": ${q(sfDir)}, "n_queries": ${status.size}, """ +
      s""""failed": ${status.collect { case (n, Some(_)) => q(n) }.mkString("[", ",", "]")}, """ +
      s""""errors": ${status.collect { case (n, Some(e)) => s"${q(n)}: ${q(e)}" }.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), manifest)
    val json = SparkEntry.oracleSql.view.filterKeys(selected.keySet)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
