package graft.model

import org.apache.spark.sql.types._

/** The reference's record types (reference schema/pulsar/avro/
  * index_topic.avro:1-52, pkg/model/model.go:18-55), as Spark case
  * classes + schemas. The Avro union-as-map decode artifact
  * (model.go:40 `Tags["array"]`) is not replicated: Spark's decoders
  * yield the array directly (SURVEY §7.4.4).
  */
final case class Tag(`type`: String, value: String)

/** Wire record (Avro `IngestionData`, index_topic.avro:1-52).
  * ingestion_time is epoch millis (model.go:24). */
final case class IngestionData(
    identifier: String,
    name: String,
    uuid: String,
    `type`: String,
    ingestion_time: Long,
    tags: Option[Seq[Tag]])

/** Indexed record (model.go:46-55): ingestion_time now a timestamp,
  * persist_time added at transform time (model.go:30,39). */
final case class IndexData(
    identifier: String,
    name: String,
    uuid: String,
    `type`: String,
    ingestion_time: java.sql.Timestamp,
    persist_time: java.sql.Timestamp,
    tags: Option[Seq[Tag]])

object Schemas {
  val tagType: StructType = StructType(Seq(
    StructField("type", StringType), StructField("value", StringType)))

  /** Spark StructType of the wire record — the reader schema handed to
    * from_json/from_avro (≈ pulsar.go:89 NewAvroSchema). */
  val ingestion: StructType = StructType(Seq(
    StructField("identifier", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("uuid", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("ingestion_time", LongType, nullable = false),
    StructField("tags", ArrayType(tagType), nullable = true)))

  /** Spark StructType of the index table as WRITTEN by
    * IngestPipeline.writeBatch — the IndexData columns (model.go:46-55)
    * plus the two physical partition keys. Boot hands this to the alias
    * read so a freshly-created (still empty) index dir can be aliased
    * before the first batch lands, mirroring the reference's
    * create-then-alias boot order (es.go:78-116). */
  val index: StructType = StructType(Seq(
    StructField("identifier", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("uuid", StringType, nullable = true),
    StructField("type", StringType, nullable = true),
    StructField("ingestion_time", TimestampType, nullable = true),
    StructField("persist_time", TimestampType, nullable = true),
    StructField("tags", ArrayType(tagType), nullable = true),
    StructField("persist_date", StringType, nullable = true),
    StructField("epoch_id", LongType, nullable = true)))

  /** Env var naming the Avro schema file (reference main.go:244 reads
    * `DATA_SCHEMA` and hands the path to ReadSchema). */
  val DataSchemaEnv = "DATA_SCHEMA"

  /** Avro reader-schema text loaded from a file path (reference
    * model.go:57-66 `ReadSchema`). The text is validated by parsing it
    * as an Avro schema here, at BOOT — an unreadable path or invalid
    * schema file throws immediately (the reference log.Fatals the same
    * way) instead of null-routing every record to the DLQ at runtime. */
  def fromFile(path: String): String = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    new org.apache.avro.Schema.Parser().parse(text) // validate or throw
    text
  }

  /** Boot-time schema resolution (reference main.go:244): the
    * DATA_SCHEMA-configured file when the env var (or an explicit path)
    * is set, else the embedded schema text. */
  def resolveAvroSchema(embedded: String,
      path: Option[String] = sys.env.get(DataSchemaEnv)): String =
    path.map(fromFile).getOrElse(embedded)
}
