package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media item: binary payload + typed metadata. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Stub "decoded" features — deterministic byte statistics standing in for
  * codec output (see [[MultimodalOps.decodeFeatures]]).
  */
case class MediaFeatures(
    media_id: Long, kind: String, n_bytes: Long,
    b_first: Long, b_last: Long, checksum: Long)

/** Multimodal columns: image/audio/video payloads carried as opaque `binary`
  * columns with typed metadata — the storage shape a 100 TB multimodal
  * training-data pipeline uses (media bytes inline in parquet or as
  * references; either way the engine sees `binary`).
  *
  * The test tables carry no real media, so [[asMedia]] derives a
  * deterministic binary corpus from `documents` (UTF-8 payloads) that the
  * DuckDB oracle reconstructs identically; every operator below treats the
  * payload as opaque bytes, exactly as it would JPEG/FLAC frames.
  *
  * The decode step is STUBBED: no image/audio codecs exist in this
  * container. [[decodeFeatures]] keeps the real Spark plumbing — typed
  * `Dataset[MediaRow]`, per-partition batch iteration with one-time decoder
  * init (the Scala analog of `mapInPandas` batching), explicit output
  * schema — and fakes only the codec call with deterministic byte stats.
  */
object MultimodalOps {

  /** Derive the media table: payload = UTF-8 bytes of `text`, kind assigned
    * round-robin (image/audio/video) by id. Deterministic on both engines.
    */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Metadata extraction: byte length, content fingerprint, magic prefix —
    * the header sniff a real pipeline runs before decoding anything.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("fp_md5"),
      lower(hex(substring(col("payload"), 1, 4))).as("magic"))
      .orderBy(col("media_id"))

  /** Frame sampling: `frames` evenly-spaced single bytes from the payload
    * (the video-frame / audio-window sampling shape), emitted as one hex
    * string. Items shorter than `frames` bytes are dropped — a real sampler
    * would route them to a short-payload path.
    */
  def frameSample(media: DataFrame, frames: Int = 8): DataFrame = {
    val len = length(col("payload"))
    val step = floor(len.cast("double") / frames).cast("int")
    val sampled = (0 until frames)
      .map(j => hex(col("payload").substr(lit(1) + lit(j) * step, lit(1))))
    media
      .filter(len >= frames)
      .select(
        col("media_id"), col("kind"),
        len.cast("long").as("n_bytes"),
        lower(concat(sampled: _*)).as("frame_hex"))
      .orderBy(col("media_id"))
  }

  /** Plant a PNG-style 12-byte header — 4 magic bytes + big-endian int32
    * width + int32 height, dims derived deterministically from the id — in
    * front of each payload. The planted corpus lets [[mediaDims]]
    * demonstrate REAL binary header arithmetic with no codec in the
    * container: the bytes genuinely carry the dimensions and genuinely get
    * parsed back out.
    */
  def plantDims(media: DataFrame): DataFrame = {
    val w = pmod(col("media_id") * 37 + 64, lit(4096)) + 1
    val h = pmod(col("media_id") * 53 + 48, lit(2160)) + 1
    media.select(
      col("media_id"), col("kind"),
      concat(
        to_binary(concat(
          lit("89504e47"),
          lpad(lower(hex(w)), 8, "0"),
          lpad(lower(hex(h)), 8, "0")), lit("hex")),
        col("payload")).as("payload"))
  }

  /** Dimension extraction from the binary header — the typed-metadata step
    * every image pipeline runs BEFORE any decode (resolution filtering,
    * aspect bucketing, resize planning read header fields, not pixels).
    * Pure byte arithmetic: slice the binary, hex it, parse base-16 — all
    * codegen'd built-ins, executable on 100 TB of payloads without
    * touching a codec. Works on [[plantDims]] output here; on real PNGs
    * the offsets would target the IHDR chunk the same way.
    */
  def mediaDims(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      conv(hex(substring(col("payload"), 5, 4)), 16, 10).cast("long").as("width"),
      conv(hex(substring(col("payload"), 9, 4)), 16, 10).cast("long").as("height"),
      (length(col("payload")) - 12).cast("long").as("body_bytes"))
      .orderBy(col("media_id"))

  /** The decode step — mapInPandas-analog plumbing, stubbed codec.
    *
    * Real shape, kept: typed input/output schemas, `mapPartitions` so a
    * decoder handle is initialized once per PARTITION (not per row) and rows
    * stream through as a batch iterator, executor-parallel, no driver
    * involvement.
    *
    * Stubbed: the codec call itself. A real implementation would replace
    * the body of `decodeOne` with e.g. JPEG decode + feature extraction;
    * here it computes deterministic byte statistics so tests and oracles
    * can verify the pipeline exactly.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition decoder init would happen here (once per task).
      def decodeOne(r: MediaRow): MediaFeatures = {
        // STUB: deterministic fake standing in for codec output.
        val b = r.payload
        val first = if (b.nonEmpty) (b(0) & 0xff).toLong else 0L
        val last = if (b.nonEmpty) (b(b.length - 1) & 0xff).toLong else 0L
        MediaFeatures(r.media_id, r.kind, b.length.toLong, first, last, (first + last) % 256)
      }
      rows.map(decodeOne)
    }
  }

  /** DataFrame entry for the typed decode path. */
  def mediaFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    decodeFeatures(media.as[MediaRow]).toDF().orderBy(col("media_id"))
  }
}
