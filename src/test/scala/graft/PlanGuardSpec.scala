package graft

/** Sweeping physical-plan guard over EVERY registered query: the
  * per-operator specs pin the plans that matter individually; this
  * catches the regression class where a future edit silently turns an
  * intended broadcast into an unpartitioned join. A CartesianProduct in
  * any registered plan is a 100 TB outage (O(n·m) with full
  * materialization both sides) — the engine's five explicit crossJoins
  * are all broadcast one-to-five-row sides, which plan as
  * BroadcastNestedLoopJoin, never CartesianProduct. */
class PlanGuardSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // executedPlan is the pre-AQE physical plan — enough to see the
        // join strategy Catalyst picked, without running the query
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}
