package graft

import org.apache.spark.sql.SparkSession

/** One place for the local-session config every main needs — the
  * TIMESTAMP(NANOS) events table makes `nanosAsLong` mandatory, and a
  * main that forgets it fails only when it first touches events. */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // local 128 GiB heap: broadcast aggressively (cluster deployments
      // tune this to executor memory)
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
