package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed multimodal record: payload is an opaque binary column plus
 * typed metadata — the schema a 100 TB image/audio corpus would use
 * (payloads in parquet binary, metadata queryable without decode). */
case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

/** Extracted feature row (decode output). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    features: Array[Float])

/**
 * Multimodal column plumbing. The Spark side — schema, binary payload
 * handling, per-partition batched decode, feature schema — is real;
 * the codec itself is a STUB (this container has no image/audio
 * libraries): `decodeStub` derives deterministic pseudo-features from
 * the payload bytes. A production deployment swaps `decodeStub` for a
 * JNI/library call without touching the plan shape: the decode runs
 * inside `mapPartitions`, so the library is initialized once per
 * partition (not per row) and rows stream through in batches.
 */
object Media {

  /** Wrap documents as fake media rows (payload = UTF-8 bytes) so the
   * plumbing is exercised end-to-end on the test corpus. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      // null text → empty payload: the decode path (mapPartitions over
      // MediaRecord) dereferences payload and must never see null
      coalesce(col("text").cast("binary"), lit(Array.emptyByteArray)).as("payload"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      when(col("doc_id") % 2 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))
      .as[MediaRecord]
  }

  /** STUB decoder: deterministic 8-dim pseudo-features from payload
   * bytes. Replace with the real codec call in production. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Batched per-partition decode/feature-extract. One initializer per
   * partition (where a real codec would load its native context). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = NativeCodec.acquire() — once per partition
      rows.map { r =>
        // defensive for records built outside fromDocuments
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        MediaFeatures(r.media_id, r.kind, payload.length.toLong,
          decodeStub(payload))
      }
    }
  }

  /** Frame sampling for video/audio payloads: split the payload into
   * fixed-size frames and keep every `everyN`-th (stub framing —
   * a real container format would drive the offsets). */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyN == 0)
        .map { case (frame, idx) => (r.media_id, idx.toLong, frame) }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
