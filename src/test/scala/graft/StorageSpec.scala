package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format coverage and the physical-layout levers the 100 TB
  * story rests on: bucketed co-located joins and partition-pruned reads. */
class StorageSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("csv / json / orc round-trip the events table") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val n = e.count()
    for (fmt <- Seq("csv", "json", "orc")) {
      val dir = tmp(s"fmt_$fmt")
      e.write.mode("overwrite").option("header", "true").format(fmt).save(dir)
      val back = spark.read.option("header", "true").option("inferSchema", "true")
        .format(fmt).load(dir)
      assert(back.count() == n, s"$fmt lost rows")
      assert(back.columns.sorted.toSeq == e.columns.sorted.toSeq, s"$fmt schema drift")
    }
  }

  test("partitionBy write enables partition pruning on read") {
    import spark.implicits._
    val dir = tmp("part")
    Tables.events(spark, sfDir)
      .withColumn("persist_date", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("persist_date").parquet(dir)
    // partition values are type-inferred on read (DateType here)
    val someDate = spark.read.parquet(dir)
      .select($"persist_date").distinct().orderBy($"persist_date").head().get(0).toString
    val pruned = spark.read.parquet(dir).filter($"persist_date" === someDate)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(persist_date"),
      s"partition filter not pushed:\n$plan")
    assert(pruned.count() > 0)
  }

  test("index alias view repoints atomically and partition-prunes (reference es.go:102-116)") {
    import spark.implicits._
    val dir = tmp("alias")
    Tables.events(spark, sfDir)
      .withColumn("persist_date", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("persist_date").parquet(dir)
    val dates = spark.read.parquet(dir)
      .select($"persist_date").distinct().orderBy($"persist_date")
      .collect().map(_.get(0).toString)
    assert(dates.length >= 2, "fixture spans < 2 days")
    val (d1, d2) = (dates.head, dates.last)
    def dayCount(d: String) = spark.read.parquet(dir)
      .filter($"persist_date" === d).count()

    graft.ops.Ingest.pointIndexAlias(spark, "index_alias", dir, d1)
    assert(spark.table("index_alias").count() == dayCount(d1))
    // the alias read prunes to the aliased day's partition
    val plan = spark.table("index_alias").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(persist_date"),
      s"alias read not partition-pruned:\n$plan")
    // repoint (daily roll ≈ reference boot-time alias update): atomic swap
    graft.ops.Ingest.pointIndexAlias(spark, "index_alias", dir, d2)
    assert(spark.table("index_alias").count() == dayCount(d2))
    spark.catalog.dropTempView("index_alias")
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val o = Tables.orders(spark, sfDir)
      val l = Tables.lineitem(spark, sfDir)
      o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      l.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: SortMergeJoin with no shuffle on either side
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == l.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
