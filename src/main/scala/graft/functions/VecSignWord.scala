package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd sign word of an array<float> vector: bit i set iff
  * v[i] > 0 — the 8-byte binary quantization `Similarity.annHamming`
  * coarse-ranks with.
  *
  * Why an Expression (VERDICT r15 #7): the first cut was 64 chained
  * `when(element_at(v, i+1) > 0, 1L << i)` additions — a ~320-node
  * expression tree that whole-stage codegen splits into dozens of
  * methods and JIT compiles per query run, measured as the only
  * shared-subset bench drift of r15 (0.76 → 1.10 s pin-to-pin). This
  * loop compiles to a dozen lines once. Same [[VecDot]] escalation
  * path: the per-row hot loop of an ANN query earns a native
  * expression.
  *
  * Vectors longer than 64 components return NULL (a silently truncated
  * sign word would rank by a prefix — the VecDot malformed-data
  * stance); shorter vectors leave the upper bits 0.
  */
case class VecSignWord(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_signword requires array<float>, got $t")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_signword"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > 64) return null
    var w = 0L
    var i = 0
    while (i < n) {
      if (x.getFloat(i) > 0.0f) w |= (1L << i)
      i += 1
    }
    w
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      s"""
         |int $n = $x.numElements();
         |if ($n > 64) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $w = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.getFloat($i) > 0.0f) $w |= (1L << $i);
         |  }
         |  ${ev.value} = $w;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): VecSignWord = copy(child = newChild)
}

object VecSignWord {
  /** Column API: the 64-bit sign word of an array<float>. */
  def vecSignWord(v: Column): Column =
    Bridge.column(VecSignWord(Bridge.expression(v)))
}
