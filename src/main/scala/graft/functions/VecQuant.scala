package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an array<float> embedding — the
  * standard IVF companion: per-vector scale = max|x|/127, code_i =
  * round(x_i/scale) in [-127, 127]. Stored codes are `array<tinyint>` —
  * a true 4× memory/shuffle cut against fp32 at 100 TB corpus scale
  * (the scale factor itself is one double per vector and CANCELS in
  * cosine, so similarity search needs only the codes; keep the scale —
  * [[VecQuant.quantScale]] — when reconstruction/dot magnitudes matter).
  *
  * Rounding is half-AWAY-FROM-ZERO (floor(x+0.5) for x≥0, ceil(x-0.5)
  * for x<0) — the same convention as DuckDB's `round()` and Spark SQL's
  * `round()` (BigDecimal HALF_UP), so codes are bit-identical
  * cross-engine: the division is one IEEE op, the compare/round is
  * exact. No clamp is needed: |x_i/scale| ≤ 127 by construction of the
  * scale. An all-zero vector (scale 0) quantizes to all-zero codes.
  *
  * Codegen'd for the same reason as [[VecDot]]: per-element lambdas
  * (`transform(...)`) evaluate interpreted and would put a
  * CodegenFallback boundary in the index-build path.
  */
case class VecQuantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_quantize requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "vec_quantize"

  @inline private def scaleOf(x: ArrayData, n: Int): Double = {
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(x.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m / 127.0
  }

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val s = scaleOf(x, n)
    val out = new Array[Byte](n)
    if (s != 0.0) {
      var i = 0
      while (i < n) {
        val r = x.getFloat(i).toDouble / s
        out(i) = (if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)).toByte
        i += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double a = Math.abs((double) $x.getFloat($i));
         |  if (a > $m) $m = a;
         |}
         |double $s = $m / 127.0;
         |byte[] $out = new byte[$n];
         |if ($s != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $r = (double) $x.getFloat($i) / $s;
         |    $out[$i] = (byte) ($r >= 0 ? Math.floor($r + 0.5d) : Math.ceil($r - 0.5d));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecQuantize =
    copy(child = newChild)
}

/** Integer dot product of two array<tinyint> code vectors, in long —
  * exact (|dot| ≤ dims·127² ≪ 2^53), so quantized cosine
  * `dotq(a,b)/sqrt(dotq(a,a)·dotq(b,b))` is one IEEE divide/sqrt over
  * exact integers: bit-identical cross-engine. NULL on length mismatch,
  * same contract as [[VecDot]]. */
case class VecDotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dotq requires (array<tinyint>, array<tinyint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dotq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
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
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long) $x.getByte($i) * (long) $y.getByte($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotQ =
    copy(left = newLeft, right = newRight)
}

object VecQuant {
  /** Column API: int8 codes of an array<float> embedding. */
  def vecQuantize(v: Column): Column =
    Bridge.column(VecQuantize(Bridge.expression(v)))

  /** Column API: exact integer dot over int8 code vectors. */
  def vecDotQ(a: Column, b: Column): Column =
    Bridge.column(VecDotQ(Bridge.expression(a), Bridge.expression(b)))

  /** The per-vector dequantization scale max|x|/127 ([[VecMaxAbsScale]],
    * codegen'd — no lambda): needed only when reconstructing magnitudes;
    * cosine over codes doesn't use it (the scales cancel). */
  def quantScale(v: Column): Column =
    Bridge.column(VecMaxAbsScale(Bridge.expression(v)))
}

/** Scalar max|x|/127 of an array<float> — the quantizer's scale, exposed
  * for callers that dequantize (cosine does not need it; it cancels). */
case class VecMaxAbsScale(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_quant_scale requires array<float>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_quant_scale"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    var m = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val a = math.abs(x.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m / 127.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = $x.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double a = Math.abs((double) $x.getFloat($i));
         |  if (a > $m) $m = a;
         |}
         |${ev.value} = $m / 127.0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecMaxAbsScale =
    copy(child = newChild)
}
