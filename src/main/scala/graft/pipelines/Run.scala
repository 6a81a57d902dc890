package graft.pipelines

import graft.sinks.TableSink
import org.apache.spark.sql.SparkSession

/**
 * Pipeline runner — the reference's CLI surface (reference: run.sh +
 * options/BQETLOptions.java) re-expressed: pick a pipeline variant,
 * point it at an input directory, truncate-and-load the output table.
 *
 *   runMain graft.pipelines.Run simple|simple-with-lookups|nested \
 *     [inDir] [outPath]
 */
object Run {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("simple-with-lookups")
    val inDir   = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outPath = if (args.length > 2) args(2)
      else java.nio.file.Files.createTempDirectory("graft_run").toString + "/out"

    val spark = graft.Sessions.local()

    val out = variant match {
      case "simple"              => Denorm.flatDenorm(spark, inDir, performLookups = false)
      case "simple-with-lookups" => Denorm.flatDenorm(spark, inDir, performLookups = true)
      case "nested"              => Denorm.nestedDenorm(spark, inDir)
      case other =>
        System.err.println(s"unknown variant '$other' (simple|simple-with-lookups|nested)")
        sys.exit(2)
    }
    TableSink.writeTruncate(out, outPath)
    val n = spark.read.parquet(outPath).count()
    println(s"""RUN_RESULT variant=$variant rows=$n out=$outPath""")
    spark.stop()
  }
}
