package graft

import graft.Exact._

/** The exact-accumulator domain guard: out-of-domain doubles must FAIL,
  * not silently vanish from the sum (ADVICE r1/r2 — under non-ANSI
  * evaluation DOUBLE→DECIMAL(38,18) yields NULL for NaN/±Inf/|x|≥1e20,
  * and SUM skips nulls). */
class ExactSpec extends SparkSpec {

  private def messages(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("dsum equals exact decimal arithmetic on finite data") {
    import spark.implicits._
    val r = Seq(0.1, 0.2, 0.3).toDF("v").agg(dsum($"v")).head().getDouble(0)
    // decimal accumulation: 0.1+0.2+0.3 is exactly 0.6 in DECIMAL(38,18)
    assert(r == 0.6)
  }

  test("dsum raises on NaN / Infinity / |x| >= 1e20 instead of dropping rows") {
    import spark.implicits._
    // ANSI mode (Spark 4 default) throws NUMERIC_VALUE_OUT_OF_RANGE for
    // |x| >= 1e20 on its own; NaN/Inf cast to NULL silently in BOTH modes
    // and are caught by the dec() guard. Either way: an error, never a
    // silently-shortened sum.
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, 1e21)) {
      val e = intercept[Exception] {
        Seq(1.0, bad).toDF("v").agg(dsum($"v")).collect()
      }
      assert(messages(e).exists(m => m.contains("exact accumulator") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
        s"expected accumulator-domain error for $bad, got: ${messages(e).headOption}")
    }
  }

  test("davg excludes nulls from numerator and denominator (ANSI AVG)") {
    import spark.implicits._
    val r = Seq(Some(2.0), None, Some(4.0)).toDF("v")
      .agg(davg($"v")).head().getDouble(0)
    assert(r == 3.0)
  }
}
