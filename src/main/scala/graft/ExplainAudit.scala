package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}

/** Diagnostic main: prints the physical plan of each registered query
  * (args select a subset) so scan pruning / pushdown / join strategy /
  * codegen spans can be audited per round. `--summary` prints one
  * PLANS.md-ready line per query (operator counts) instead of the full
  * plan. Not part of the driver contract.
  * Usage: runMain graft.ExplainAudit [sfDir] [--summary] [query ...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val summary = args.contains("--summary")
    // --formatted: the .explain("formatted") form (numbered operators +
    // per-operator details) the optimization rounds commit under plans/
    val formatted = args.contains("--formatted")
    val rest = args.drop(1)
      .filterNot(a => a == "--summary" || a == "--formatted").toSeq
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(s: String, needle: String): Int =
      s.sliding(needle.length).count(_ == needle)
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          if (formatted) FormattedMode else SimpleMode)
      if (summary) {
        // shuffle exchanges exclude broadcast builds; codegen spans via
        // the stage markers in SimpleMode output
        val shuffles = count(plan, "Exchange ") - count(plan, "BroadcastExchange ")
        println(f"$name%-26s scans=${count(plan, "Scan parquet")}%d " +
          f"shuffles=$shuffles%d bcast=${count(plan, "BroadcastExchange")}%d " +
          f"bhj=${count(plan, "BroadcastHashJoin")}%d smj=${count(plan, "SortMergeJoin")}%d " +
          f"window=${count(plan, "Window")}%d agg=${count(plan, "HashAggregate")}%d " +
          f"sortAgg=${count(plan, "SortAggregate")}%d")
      } else {
        println(s"\n########## $name")
        println(plan)
      }
    }
    spark.stop()
  }
}
