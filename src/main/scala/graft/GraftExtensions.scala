package graft

import graft.functions.{AvroDecodeIngestion, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so they are callable from spark.sql as
  * well as the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * spark-submit --conf) — the standard extension mechanism, no Spark
  * internals involved.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("avro_decode_ingestion"),
      new ExpressionInfo(classOf[AvroDecodeIngestion].getName, "avro_decode_ingestion"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AvroDecodeIngestion(children.head)))
  }
}
