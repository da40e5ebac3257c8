package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder north star): image/audio/video
  * as opaque `binary` columns with typed metadata, plus
  * decode/feature-extract/frame-sample stages.
  *
  * The actual codec step is STUBBED — no image/audio libraries exist in
  * this container — with a deterministic fake (hash-derived features),
  * clearly marked below. Everything around it is real and tested: the
  * media schema, the binary column handling, the batched
  * `mapPartitions` decode boundary (the Scala analog of
  * `mapInPandas` — an iterator of rows in, an iterator of decoded rows
  * out, so a real decoder amortizes model/codec init per partition, not
  * per row), partitioning, and the explode-shaped frame sampling.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** Synthesize a media table from `documents` (deterministic: the
    * testdata ships no binary table — text bytes stand in for encoded
    * media payloads; ids/kinds/meta derive arithmetically).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate")).as("meta"))

  /** Batched decode + feature extraction over the binary column.
    *
    * ==== STUB ====
    * `fakeDecode` stands in for a real codec (JPEG decode, PCM frame
    * read, ...): it derives 8 deterministic floats from the payload
    * bytes. A real implementation replaces ONLY this function; the
    * partition-batched iterator plumbing around it is production-shaped.
    */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("media_id"), col("kind"), col("bytes"),
        col("meta.width"), col("meta.height"), col("meta.sample_rate"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init happens HERE (codec handles, model weights)
        rows.map { r =>
          MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, fakeDecode(r.bytes))
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Harness-safe form of [[mediaFeatures]]: the driver's pandas-based
    * compare can't sort array-typed columns, so the 8-float feature
    * vector is posexploded to (media_id, feat_idx, feat_value) scalars.
    * Rounded to 6 decimals so the dump is stable across float printing.
    */
  def mediaFeaturesFlat(s: SparkSession, d: String): DataFrame =
    mediaFeatures(s, d)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        posexplode(col("features")).as(Seq("feat_idx", "feat_value")))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("feat_idx").cast("long").as("feat_idx"),
        round(col("feat_value").cast("double"), 6).as("feat_value"))
      .orderBy("media_id", "feat_idx")

  /** STUB decoder: 8 floats from a rolling polynomial hash of the
    * payload — deterministic, so tests can assert exact values.
    */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % 8) += (h & 0xffff).toFloat / 65536f
      i += 1
    }
    out
  }

  /** Frame sampling: slice the payload into fixed-size pseudo-frames
    * and explode — the plan shape of video frame extraction (one input
    * row → N frame rows) without a codec. Pure expressions: the slicing
    * pipelines inside the scan stage.
    */
  def frameSample(s: SparkSession, d: String, frameBytes: Int = 64): DataFrame = {
    val nFrames = ceil(length(col("bytes")).cast("double") / frameBytes).cast("int")
    mediaTable(s, d)
      .filter(col("kind") === "video" && length(col("bytes")) > 0)
      .select(
        col("media_id"),
        posexplode(transform(sequence(lit(0), nFrames - 1),
          i => substring(col("bytes"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_no", "frame_bytes")))
      .orderBy("media_id", "frame_no")
  }

  /** Metadata "resize": pure struct rewrite (the cheap half of an image
    * resize pipeline — the pixel work would live in mediaFeatures'
    * decode stage).
    */
  def resizeMeta(s: SparkSession, d: String, maxW: Int = 640): DataFrame =
    mediaTable(s, d).select(
      col("media_id"), col("kind"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      least(col("meta.width"), lit(maxW)).as("out_width"),
      (col("meta.height") * least(col("meta.width"), lit(maxW)) / col("meta.width"))
        .cast("int").as("out_height"))
      .orderBy("media_id")
}
