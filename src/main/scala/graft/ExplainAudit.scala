package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Diagnostic main: prints the physical plan of each registered query
  * (args select a subset) so scan pruning / pushdown / join strategy /
  * codegen spans can be audited per round. Not part of the driver
  * contract. Usage: runMain graft.ExplainAudit [sfDir] [query ...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n########## $name")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(SimpleMode))
    }
    spark.stop()
  }
}
