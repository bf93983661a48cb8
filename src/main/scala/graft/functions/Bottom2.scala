package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bottom-2 aggregate: the two SMALLEST DISTINCT non-null values of an
  * orderable column, as a 2-element array (`[min, second-min]`, either
  * slot null when fewer than that many distinct values were seen).
  *
  * Built for the winnowing-style sketches (TextAnalysis.docFingerprint
  * bottom-2 of k-gram hashes): the obvious
  * `sort_array(collect_set(x))[1:2]` materializes EVERY distinct value
  * per group in an ObjectHashAggregate buffer — per-group state
  * proportional to document length, exactly what blows up executor
  * memory at 100 TB. This is a [[DeclarativeAggregate]] instead: the
  * buffer is two fixed slots and every update/merge is a pure CASE
  * expression, so per-group state is constant and partials combine
  * map-side.
  *
  * Aggregate STRATEGY depends on the child type: with fixed-width
  * buffer slots (long, int, double — docFingerprint feeds 60-bit digest
  * longs) this runs as a real codegen'd HashAggregate; with var-length
  * slots (string) Spark 4 plans SortAggregate instead, because
  * UnsafeRow cannot mutate var-length buffer fields — still
  * constant-state and correct, but it adds per-partition sorts, so
  * hash-encode first when the input has a faithful fixed-width form
  * (Bottom2Spec pins both plan shapes).
  *
  * Ordering caveat: comparisons are LessThan/EqualTo, i.e. Spark's
  * binary comparison operators. For floating-point children with NaN
  * these disagree with sort_array's total order (NaN sorts last but
  * `x < NaN` is false); integral, string, decimal and timestamp
  * children are exact.
  *
  * Distinctness is handled in the transition itself (an incoming value
  * equal to the current min is a no-op), so no DISTINCT rewrite or
  * pre-dedup shuffle is required for correctness — though callers that
  * also need an exact distinct COUNT (docFingerprint does) typically
  * dedup first anyway and share that shuffle.
  */
case class Bottom2(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "bottom2"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  private lazy val minA = AttributeReference("bottom2_min", child.dataType)()
  private lazy val minB = AttributeReference("bottom2_second", child.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(minA, minB)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, child.dataType), Literal.create(null, child.dataType))

  /** The buffer transition for one incoming value x, as two parallel
    * expressions over the OLD buffer (a, b). Invariant kept: a < b when
    * both set; a set before b. */
  private def insert(a: Expression, b: Expression, x: Expression): Seq[Expression] = {
    val newA = CaseWhen(Seq(
      (IsNull(x), a),
      (Or(IsNull(a), LessThan(x, a)), x)), a)
    val newB = CaseWhen(Seq(
      (Or(IsNull(x), IsNull(a)), b), // no value, or x just became the first a
      (EqualTo(x, a), b),            // duplicate of the min: no-op
      (LessThan(x, a), a),           // old min demoted to second
      (Or(IsNull(b), LessThan(x, b)), x)), b)
    Seq(newA, newB)
  }

  override lazy val updateExpressions: Seq[Expression] =
    insert(minA, minB, child)

  override lazy val mergeExpressions: Seq[Expression] = {
    val step = insert(minA.left, minB.left, minA.right)
    insert(step(0), step(1), minB.right)
  }

  override lazy val evaluateExpression: Expression =
    CreateArray(Seq(minA, minB))

  override protected def withNewChildInternal(newChild: Expression): Bottom2 =
    copy(child = newChild)
}

object Bottom2 {
  /** Column-API form: `bottom2(col)`. */
  def bottom2(c: Column): Column =
    Bridge.column(Bottom2(Bridge.expression(c)).toAggregateExpression())
}
