package graft.functions

import graft.model.Schemas
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro wire decode for the reference's `IngestionData` record (S2,
  * reference pulsar.go:89 `NewAvroSchema` + main.go:145-158 `parseMsg`):
  * binary → struct, null on any decode failure — the parse-validate
  * semantics (P2) where failures route to the DLQ instead of failing the
  * job.
  *
  * Built directly on avro-core (bundled with Spark) because the
  * spark-avro module isn't in this environment; the schema is the fixed
  * reader schema from the reference (index_topic.avro:1-52), so this is
  * a schema-specialized decoder, not a generic from_avro.
  *
  * CodegenFallback is deliberate: the decode cost is the Avro codec
  * itself (same work the reference does per message); codegen would
  * only inline the call. Reader/decoder are allocated lazily per task
  * and reused across rows.
  *
  * `schemaJson` is the READER schema text — by default the embedded
  * schema-as-code, but boot code can hand in text loaded from a
  * configured file path (reference model.go:57-66 ReadSchema, env
  * DATA_SCHEMA; see graft.model.Schemas.fromFile). It must describe the
  * same IngestionData record shape (the output StructType is fixed);
  * what the file seam buys is the reference's ops surface — rotating
  * schema doc/defaults/aliases without a rebuild.
  */
case class AvroDecodeIngestion(child: Expression,
    schemaJson: String = AvroDecodeIngestion.SchemaJson)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"avro_decode_ingestion requires binary, got $t")
  }
  override def dataType: DataType = Schemas.ingestion
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode_ingestion"

  @transient private lazy val avroSchema: Schema =
    new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](avroSchema)
  @transient private lazy val decoderFactory = DecoderFactory.get()

  private def utf8(v: AnyRef): UTF8String =
    if (v == null) null else UTF8String.fromString(v.toString)

  override protected def nullSafeEval(input: Any): Any = {
    try {
      val bytes = input.asInstanceOf[Array[Byte]]
      val rec = reader.read(null, decoderFactory.binaryDecoder(bytes, null))
      val tags: ArrayData = rec.get("tags") match {
        case null => null
        case arr: java.util.Collection[_] =>
          val rows = new Array[Any](arr.size())
          var i = 0
          val it = arr.iterator()
          while (it.hasNext) {
            val t = it.next().asInstanceOf[GenericRecord]
            rows(i) = InternalRow(utf8(t.get("type")), utf8(t.get("value")))
            i += 1
          }
          new GenericArrayData(rows)
        case _ => null
      }
      InternalRow(
        utf8(rec.get("identifier")), utf8(rec.get("name")),
        utf8(rec.get("uuid")), utf8(rec.get("type")),
        rec.get("ingestion_time").asInstanceOf[java.lang.Long].longValue(),
        tags)
    } catch {
      // decode failure ⇒ null ⇒ DLQ branch (reference main.go:136-141)
      case _: Exception => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecodeIngestion =
    copy(child = newChild)
}

object AvroDecodeIngestion {
  /** The wire schema (reference schema/pulsar/avro/index_topic.avro:1-52,
    * re-expressed — tags is a nullable array of {type, value} records). */
  val SchemaJson: String =
    """{"type":"record","name":"IngestionData","namespace":"graft","fields":[
      |{"name":"identifier","type":"string"},
      |{"name":"name","type":"string"},
      |{"name":"uuid","type":"string"},
      |{"name":"type","type":"string"},
      |{"name":"ingestion_time","type":"long"},
      |{"name":"tags","type":["null",{"type":"array","items":
      |  {"type":"record","name":"Tags","fields":[
      |    {"name":"type","type":"string"},{"name":"value","type":"string"}]}}],
      | "default":null}]}""".stripMargin.replace("\n", "")

  def avroDecode(c: Column): Column = Bridge.column(AvroDecodeIngestion(Bridge.expression(c)))

  /** Decode with an explicit reader-schema text (e.g. loaded from the
    * DATA_SCHEMA-configured file via Schemas.fromFile). */
  def avroDecode(c: Column, schemaJson: String): Column =
    Bridge.column(AvroDecodeIngestion(Bridge.expression(c), schemaJson))
}
