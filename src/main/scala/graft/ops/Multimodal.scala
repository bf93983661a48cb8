package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media record: opaque bytes + typed metadata. */
final case class MediaRecord(doc_id: Long, mime: String, content: Array[Byte],
    n_bytes: Int)

/** Extracted features for one media record. */
final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
    features: Array[Float], frame_offsets: Array[Int])

/** Multimodal-column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] derives a deterministic 16-bin byte
  * histogram instead of pixels. Everything around the stub — the binary
  * column schema, the typed Dataset boundary, the per-partition batch
  * shape a real decoder would amortize setup over, and the frame-sample
  * arithmetic — is real and tested.
  *
  * Scale notes: decode is a narrow per-partition map (no shuffle); a
  * real deployment sizes `spark.sql.files.maxPartitionBytes` down for
  * fat binary rows so a partition of media bytes still fits in executor
  * memory, and stores content as separate objects with only pointers +
  * metadata in the table once rows exceed ~tens of MB.
  */
object Multimodal {

  /** The media table: fixture text re-encoded as opaque bytes + metadata
    * (mime rotates by doc_id to exercise per-type branching). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id",
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod($"doc_id", lit(3L)) + 1).cast("int")).as("mime"),
      encode($"text", "UTF-8").as("content"),
      octet_length(encode($"text", "UTF-8")).as("n_bytes"))
  }

  /** STUB decode: a real implementation would decode image pixels /
    * audio samples here (per-partition so codec setup is amortized).
    * The deterministic stand-in is a 16-bin byte histogram normalized
    * by length — shape-compatible with a real feature vector. */
  private[graft] def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < content.length) { hist((content(i) & 0xff) >> 4) += 1f; i += 1 }
    if (content.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= content.length.toFloat; j += 1 }
    }
    hist
  }

  /** Frame sampling: every `step` bytes stands in for every Nth video
    * frame; images sample offset 0 only. */
  private[graft] def frameOffsets(mime: String, nBytes: Int, step: Int = 64): Array[Int] =
    if (mime.startsWith("video/")) (0 until nBytes by step).toArray
    else Array(0)

  /** Decode + feature-extract + frame-sample over the typed Dataset
    * boundary. mapPartitions (not per-row map) is deliberate: real
    * decoders batch per partition. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { recs =>
      // per-partition: a real codec would initialize once here
      recs.map { r =>
        MediaFeatures(r.doc_id, r.mime, r.n_bytes,
          decodeStub(r.content), frameOffsets(r.mime, r.n_bytes))
      }
    }
  }

  /** Oracle-checked metadata query: binary length + mime branching are
    * SQL-expressible; the decode stub is not (rows-only + ScalaTest). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"doc_id", $"mime", $"n_bytes",
        when($"mime".startsWith("video/"),
          ceil($"n_bytes".cast("double") / 64.0).cast("long"))
          .otherwise(lit(1L)).as("n_frames"))
      .orderBy($"doc_id")
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1] AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  CASE WHEN ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 AS INTEGER) + 1] LIKE 'video/%'
      |       THEN CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64.0) AS BIGINT)
      |       ELSE 1 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Feature extraction as a registered query (rows-only check: the
    * decode stub is not SQL-expressible; determinism and shape are
    * asserted in MultimodalSpec). Features surfaced as a stable string
    * digest to keep the dumped schema simple. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, dir).toDF()
      .select($"doc_id", $"mime", $"n_bytes",
        size($"features").as("n_features"),
        size($"frame_offsets").as("n_frames"))
      .orderBy($"doc_id")
  }
}
