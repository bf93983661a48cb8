package graft

import graft.functions.{AvroDecodeIngestion, Bottom2, VecDot, VecDotQ, VecQuantize, VecSignWord}
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
  // Wrong argument counts raise a clean analysis-time error with the
  // expected signature, not an IndexOutOfBoundsException (ADVICE r2).
  private def arity(name: String, sig: String, n: Int)(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`", "expectedNum" -> s"$n ($sig)",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("vec_dot", "vec_dot(array<float>, array<float>)", 2)(children)
        VecDot(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_quantize"),
      new ExpressionInfo(classOf[VecQuantize].getName, "vec_quantize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("vec_quantize", "vec_quantize(array<float>)", 1)(children)
        VecQuantize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dotq"),
      new ExpressionInfo(classOf[VecDotQ].getName, "vec_dotq"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("vec_dotq", "vec_dotq(array<tinyint>, array<tinyint>)", 2)(children)
        VecDotQ(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_signword"),
      new ExpressionInfo(classOf[VecSignWord].getName, "vec_signword"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("vec_signword", "vec_signword(array<float>)", 1)(children)
        VecSignWord(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bottom2"),
      new ExpressionInfo(classOf[Bottom2].getName, "bottom2"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("bottom2", "bottom2(orderable)", 1)(children)
        Bottom2(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("avro_decode_ingestion"),
      new ExpressionInfo(classOf[AvroDecodeIngestion].getName, "avro_decode_ingestion"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("avro_decode_ingestion", "avro_decode_ingestion(binary)", 1)(children)
        AvroDecodeIngestion(children.head)
      }))
  }
}
