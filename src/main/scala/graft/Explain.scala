package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * registered queries (all of them with no args) without executing —
  * the `.explain("formatted")` iteration loop the build process runs
  * after every operator change (pushed filters, broadcast choices,
  * codegen spans, exchange placement).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Explain q1_agg ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.contains(n) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
