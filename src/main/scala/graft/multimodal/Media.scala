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

  /** Content-addressable EXACT media dedup (C12b) — collapse
   * byte-identical payloads without decoding them: group on the
   * payload digest, representative = lowest media_id. This is the
   * dedup a 100 TB media corpus runs first (re-crawled/re-encoded
   * copies are byte-identical far more often than pixel-identical),
   * and it needs no codec — which is exactly why it can be a FULL
   * oracle row inside the no-codec wall (VERDICT r15 #5).
   * Emits (media_id, rep_id, n_copies, sig). One digest projection +
   * one digest-keyed window — shuffles hashes, never payloads. */
  def exactDedup(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("sig")
    media.select(col(idCol).cast("long").as("media_id"),
        md5(col(payloadCol)).as("sig"))
      .select(col("media_id"),
        min("media_id").over(w).as("rep_id"),
        count(lit(1)).over(w).as("n_copies"),
        col("sig"))
  }

  /** Container-header description (C12d, r17) — what "describe the
   * multimodal column" can honestly mean inside the no-codec wall:
   * PNG IHDR, RIFF/WAV fmt-chunk, and JPEG SOF headers are fixed byte
   * layouts, so format, dimensions, sample rate, and channel count
   * come straight from the payload's first bytes — one codegen'd
   * byte-arithmetic expression
   * ([[graft.functions.expressions.headerMeta]]), no decode, no
   * library, garbage-safe (alien/truncated payloads classify as
   * 'unknown', never throw). A real corpus runs this at ingest to
   * route payloads and validate claimed metadata BEFORE paying for
   * decode. Emits (media_id, format, width, height, sample_rate,
   * channels) — one pass, no shuffle. */
  def describeHeaders(media: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    withHeaderMeta(media.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol)), payloadCol)
      .select("media_id", "format", "width", "height", "sample_rate", "channels")

  /** [[describeHeaders]] as an ENRICHMENT: append the five header
   * columns to the input, keeping every existing column (payload
   * included) — the shape a router needs, where the payload travels
   * on to its format's sink. Refuses an input that ALREADY carries
   * any of the five output names: withColumn would silently replace
   * it, destroying exactly the claimed metadata a caller might want
   * to compare the parsed values against — rename claimed columns
   * (e.g. `claimed_width`) before enriching. */
  def withHeaderMeta(media: DataFrame, payloadCol: String): DataFrame = {
    val out = Seq("format", "width", "height", "sample_rate", "channels")
    val clash = media.columns.filter(out.contains)
    require(clash.isEmpty,
      s"withHeaderMeta: input already has column(s) ${clash.mkString(", ")} — " +
        "rename them (e.g. claimed_width) so parsed header values cannot " +
        "silently overwrite claimed metadata")
    media.withColumn("_h", graft.functions.expressions.headerMeta(col(payloadCol)))
      .withColumn("format",
        when(element_at(col("_h"), 1) === 1L, "png")
          .when(element_at(col("_h"), 1) === 2L, "wav")
          .when(element_at(col("_h"), 1) === 3L, "jpeg")
          .otherwise("unknown"))
      .withColumn("width", element_at(col("_h"), 2))
      .withColumn("height", element_at(col("_h"), 3))
      .withColumn("sample_rate", element_at(col("_h"), 4))
      .withColumn("channels", element_at(col("_h"), 5))
      .drop("_h")
  }

  /** Per-media chunk signature set: the digest of every FULL
   * `chunkBytes`-sized slice of the payload (the trailing partial
   * chunk is dropped — its length differs between variants, so it
   * would only add noise to resemblance). Distinct per media. */
  def chunkSignatures(media: DataFrame, idCol: String, payloadCol: String,
      chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1, s"chunkBytes must be >= 1, got $chunkBytes")
    media.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).as("p"))
      // payloads shorter than one chunk have an EMPTY signature set;
      // filter them before the explode (Spark's sequence(0, -1) is a
      // DESCENDING [0, -1], not empty — it would emit garbage chunks)
      .filter(length(col("p")) >= chunkBytes)
      .select(col("media_id"), col("p"),
        explode(sequence(lit(0),
          (length(col("p")) / chunkBytes).cast("int") - 1)).as("i"))
      .select(col("media_id"),
        md5(substring(col("p"), col("i") * chunkBytes + 1,
          lit(chunkBytes))).as("sig"))
      .distinct()
  }

  /** Chunk-signature NEAR-dup pairs (C12b) — the no-codec near-dup
   * screen: two payloads are near-duplicates when their chunk
   * signature sets resemble (|A∩B| / |A∪B| ≥ threshold). Catches
   * truncated/appended/locally-edited re-uploads that exact dedup
   * misses, still without decoding a byte.
   *
   * Scale shape: the pair generation is a self-join BUCKETED on the
   * chunk digest (never all-pairs), and chunk digests shared by more
   * than `maxChunkFreq` media are dropped first — the stop-chunk
   * guard (the C2/C48 prefix-filter discipline): a boilerplate chunk
   * shared by a million files would otherwise emit a quadratic
   * bucket. Dropping hot chunks only LOWERS resemblance, so the
   * guard trades recall on boilerplate-heavy pairs for a hard bound
   * on bucket fan-out; the cap is part of the operator contract and
   * replayed by the oracle.
   *
   * Emits (media_a, media_b, shared_chunks, resemblance_ppm),
   * media_a < media_b, resemblance in integer ppm (truncating div —
   * engine-stable). */
  def nearDupPairs(media: DataFrame, idCol: String, payloadCol: String,
      chunkBytes: Int, maxChunkFreq: Int, thresholdPpm: Long): DataFrame = {
    require(maxChunkFreq >= 2, s"maxChunkFreq must be >= 2, got $maxChunkFreq")
    val sigs = chunkSignatures(media, idCol, payloadCol, chunkBytes)
    val cold = sigs.join(
      sigs.groupBy("sig").agg(count(lit(1)).as("nm"))
        .filter(col("nm") > maxChunkFreq)
        .select("sig"),
      Seq("sig"), "left_anti")
    val sizes = cold.groupBy("media_id").agg(count(lit(1)).as("n_chunks"))
    val a = cold.select(col("media_id").as("media_a"), col("sig"))
    val b = cold.select(col("media_id").as("media_b"), col("sig"))
    a.join(b, Seq("sig"))
      .filter(col("media_a") < col("media_b"))
      .groupBy("media_a", "media_b")
      .agg(count(lit(1)).as("shared_chunks"))
      .join(sizes.select(col("media_id").as("media_a"), col("n_chunks").as("na")),
        Seq("media_a"))
      .join(sizes.select(col("media_id").as("media_b"), col("n_chunks").as("nb")),
        Seq("media_b"))
      .select(col("media_a"), col("media_b"), col("shared_chunks"),
        expr("shared_chunks * 1000000 div (na + nb - shared_chunks)")
          .cast("long").as("resemblance_ppm"))
      .filter(col("resemblance_ppm") >= thresholdPpm)
  }
}
