package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for oracle-compared aggregates.
  *
  * Summing IEEE doubles is order-dependent; Spark's parallel partial
  * aggregation and DuckDB's sequential scan would round differently in the
  * last ulp and fail the driver's hash compare. Routing the sum through an
  * exact DECIMAL accumulator makes it order-independent in both engines,
  * and the final DECIMAL->DOUBLE conversion is the same round-to-nearest
  * in both — so results are bit-identical AND still reproducible on a
  * 1000-executor cluster where partition order is nondeterministic.
  */
object Exact {
  private val Acc = DecimalType(38, 18)

  /** Exact-accumulator cast for contexts that need the raw DECIMAL column
    * (e.g. window running sums). Oracle form: CAST(x AS DECIMAL(38,18)).
    *
    * Domain: finite inputs with |x| < 1e20. Under non-ANSI evaluation the
    * DOUBLE→DECIMAL cast silently yields NULL outside that domain, which
    * a SUM would then silently skip — so the guard is ENFORCED (ADVICE
    * r1/r2): a non-null input whose decimal cast comes back null raises a
    * runtime error naming the value instead of corrupting the aggregate.
    * Cost is one codegen'd null-check per row, dwarfed by the decimal
    * arithmetic it protects. */
  def dec(c: Column): Column = {
    val d = c.cast(Acc)
    when(c.isNotNull && d.isNull,
      raise_error(concat(
        lit("graft.Exact: non-finite or |x|>=1e20 value in exact accumulator: "),
        c.cast("string")))).otherwise(d)
  }

  /** Order-independent sum of a double expression; returns DOUBLE.
    * Oracle form: CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent mean; DOUBLE / BIGINT division is
    * IEEE-deterministic. Divides by count(c) — nulls excluded from both
    * numerator and denominator, matching ANSI AVG (ADVICE r2; COUNT(*)
    * would silently shift the mean on nullable columns). Oracle form:
    * CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)/COUNT(x) —
    * equivalently COUNT(*) on the non-null fixture columns. */
  def davg(c: Column): Column = dsum(c) / count(c)
}
