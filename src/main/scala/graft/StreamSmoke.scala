package graft

import graft.streaming.{Event, EventStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming smoke: drive the stateful sessionizer as a real
  * Structured Streaming query over the events parquet (file source),
  * then cross-check every emitted session against the batch
  * q_sessionize result (oracle-checked separately). Sessions still
  * open when the stream drains can't be closed by the watermark, so
  * streaming output must be a subset of the batch sessions. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local("4")
    import spark.implicits._

    // the file streaming source wants a directory — stage the single
    // parquet file into one
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("event_type"), col("value"))
      .as[Event]
    val q = EventStream.sessionize(stream, 1800)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    q.processAllAvailable(); q.stop()

    // streaming dedup over the same stream: event_ids are unique in the
    // data, so output count must equal input count (state bounded by
    // the watermark)
    val dedupIn = spark.readStream.schema(schema).parquet(staged.toString)
      .select(col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"))
    val dq = EventStream.dedupStream(dedupIn, Seq("event_id"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    dq.processAllAvailable(); dq.stop()
    val nIn = spark.read.parquet(s"$dir/events.parquet").count()
    val nOut = spark.table("deduped").count()
    println(s"DEDUP_IN=$nIn DEDUP_OUT=$nOut")

    val streamed = spark.table("sessions")
      .select($"user_id", date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("start"),
        $"n_events")
    val batch = SparkEntry.queries("q_sessionize")(spark, dir)
      .select($"user_id", $"session_start".as("start"), $"n_events")
    val nStream = streamed.count()
    val nBatch = batch.count()
    val unmatched = streamed.except(batch).count()
    println(s"STREAM_SESSIONS=$nStream BATCH_SESSIONS=$nBatch UNMATCHED=$unmatched")
    spark.stop()
  }
}
