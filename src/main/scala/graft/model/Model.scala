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
}
