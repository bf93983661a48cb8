package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two array<float> columns, in double.
  *
  * The sum is a sequential left-to-right loop — the SAME addition order
  * as `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and as DuckDB's
  * `list_reduce`, so results stay bit-identical to the oracle (FP
  * addition is order-dependent; the order is part of the contract here).
  *
  * Why an Expression and not the higher-order-function composition:
  * Spark's lambda functions evaluate interpreted (CodegenFallback) —
  * ~10× slower per element and a codegen boundary in the middle of an
  * otherwise whole-stage-codegen'd scoring pipeline. This is the
  * "custom Catalyst Expression beats Scala UDF beats everything else"
  * escalation path of SURVEY §2.12/§4, reached because similarity
  * scoring is the per-row hot loop of the ANN queries.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  // mismatched lengths yield null (below), on top of null-in-null-out
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  /** Mismatched vector lengths return NULL rather than silently dotting
    * the common prefix: the oracle form (`Similarity.dotSql`) ranges over
    * the longer length, so an out-of-range index on EITHER side makes the
    * whole fold NULL-propagate — a truncated number here would diverge on
    * malformed data (ADVICE r2). */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column API: dot(a, b) over array<float>. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))
}
