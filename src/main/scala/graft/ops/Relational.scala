package graft.ops

import graft.Exact._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.5–2.9): the categories the
  * reference lacks entirely, expressed as declarative DataFrame plans so
  * Catalyst supplies pushdown, pruning, join selection and AQE.
  */
object Relational {

  /** TPC-H Q1-flavor scan→filter→agg→sort over lineitem.
    * The shipdate predicate is pushed to the parquet scan (placed BELOW
    * Tables.par so pushdown survives — plan-pinned in QueriesSmokeSpec);
    * the aggregate is a partial/final hash aggregate with map-side
    * combine — the canonical 100TB-safe shape (no shuffle of raw rows,
    * only of group states). Tables.par spreads the 7-accumulator DECIMAL
    * partial aggregation across cores (single-row-group fixture scan).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // Oracle convention for all decimal-accumulated sums: DuckDB casts
  // double→decimal from the exact binary value, Spark from the shortest
  // decimal repr (java BigDecimal.valueOf) — routing DuckDB through
  // VARCHAR (shortest repr too) makes the per-row decimals, and hence the
  // exact sums, bit-identical across engines. See graft.Exact.
  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(CAST(SUM(CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** §2.5 — star-schema equi-join chain: lineitem ⋈ orders ⋈ customer ⋈
    * nation, revenue per nation. nation (25 rows) is explicitly
    * broadcast; customer is under the default broadcast threshold at
    * small SF and AQE picks broadcast at 100 TB only if stats allow —
    * the fact-fact join (lineitem⋈orders) shuffles on the orderkey,
    * which is the natural co-partition key (both sides bucketed by
    * orderkey in a production warehouse would make it shuffle-free). */
  def joinStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  val joinStarSql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** §2.5 — outer join with unmatched-side nulls: every part with its
    * lineitem count (0 for parts never shipped). count(l_orderkey)
    * counts only matched rows — the ANSI null-skipping semantics. */
  def joinLeft(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .join(Tables.lineitem(spark, dir), $"p_partkey" === $"l_partkey", "left")
      .groupBy($"p_partkey")
      .agg(count($"l_orderkey").as("n_lineitems"))
      .orderBy($"p_partkey")
  }

  val joinLeftSql: String =
    """SELECT p_partkey, COUNT(l_orderkey) AS n_lineitems
      |FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin

  /** §2.5 — FULL OUTER join, both sides genuinely unmatched: per-user
    * purchase vs signup activity (users who only purchased, only signed
    * up, or did both). USING-style key join so the key column coalesces
    * across sides; both inputs are pre-aggregated, so the outer join
    * runs on small keyed frames, not raw events. */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val p = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(count(lit(1)).as("n_purchases"))
    val s = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(count(lit(1)).as("n_signups"))
    p.join(s, Seq("user_id"), "full_outer")
      .select($"user_id",
        coalesce($"n_purchases", lit(0L)).as("n_purchases"),
        coalesce($"n_signups", lit(0L)).as("n_signups"))
      .orderBy($"user_id")
  }

  val joinFullSql: String =
    """SELECT user_id,
      |  COALESCE(n_purchases, 0) AS n_purchases,
      |  COALESCE(n_signups, 0) AS n_signups
      |FROM (SELECT user_id, COUNT(*) AS n_purchases FROM events
      |      WHERE event_type = 'purchase' GROUP BY user_id) p
      |FULL JOIN (SELECT user_id, COUNT(*) AS n_signups FROM events
      |           WHERE event_type = 'signup' GROUP BY user_id) s USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** §2.6 — arbitrary GROUPING SETS (not the rollup/cube lattice):
    * per-type totals, per-user-bucket totals, and the grand total in one
    * pass, disambiguated by grouping_id. Spark plans this as one Expand
    * + hash aggregate — rows replicate once per matching set, partials
    * combine map-side; no multi-query union. */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("ub", pmod($"user_id", lit(4L)))
      .groupingSets(Seq(Seq($"event_type"), Seq($"ub"), Seq.empty),
        $"event_type", $"ub")
      .agg(count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))
      .orderBy($"gid", $"event_type".asc_nulls_first, $"ub".asc_nulls_first)
  }

  val aggGroupingSetsSql: String =
    """SELECT event_type, ub, COUNT(*) AS cnt,
      |  CAST(GROUPING(event_type, ub) AS INTEGER) AS gid
      |FROM (SELECT event_type, user_id % 4 AS ub FROM events)
      |GROUP BY GROUPING SETS ((event_type), (ub), ())
      |ORDER BY gid, event_type NULLS FIRST, ub NULLS FIRST""".stripMargin

  /** §2.6 — distinct aggregation: exact COUNT(DISTINCT) per group. At
    * scale Spark plans this as a two-phase expand/partial-agg — no
    * driver-side distinct. The HLL approximate variant is registered
    * separately ([[aggHll]], rows-only check — sketch values are
    * engine-specific by design). */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        count_distinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  val aggDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** §2.6 — approx_count_distinct (HLL++). No oracle: sketch estimates
    * are engine-specific; correctness is covered by a ScalaTest bound
    * (estimate within rsd of exact). */
  def aggHll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.02).as("n_users_approx"))
      .orderBy($"event_type")
  }

  /** §2.6 — ROLLUP hierarchy totals with GROUPING marker. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .rollup($"event_type")
      .agg(count(lit(1)).as("cnt"), grouping($"event_type").as("g"))
      .orderBy($"g", $"event_type".asc_nulls_first)
  }

  val aggRollupSql: String =
    """SELECT event_type, COUNT(*) AS cnt, GROUPING(event_type) AS g
      |FROM events GROUP BY ROLLUP(event_type)
      |ORDER BY g, event_type NULLS FIRST""".stripMargin

  /** §2.6 — CUBE over two dimensions (event_type × user bucket). */
  def aggCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("ub", pmod($"user_id", lit(4L)))
      .cube($"event_type", $"ub")
      .agg(count(lit(1)).as("cnt"), dsum($"value").as("sum_value"))
      .orderBy($"event_type".asc_nulls_first, $"ub".asc_nulls_first)
  }

  val aggCubeSql: String =
    """SELECT event_type, ub, COUNT(*) AS cnt,
      |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM (SELECT event_type, user_id % 4 AS ub, value FROM events)
      |GROUP BY CUBE(event_type, ub)
      |ORDER BY event_type NULLS FIRST, ub NULLS FIRST""".stripMargin

  /** §2.7 — the analytic-window surface: row_number, rank, lag, lead,
    * and a running sum with an explicit ROWS frame. The running sum
    * accumulates in DECIMAL so the result is order-independent across
    * engines (Exact). Shuffle = one hash partition by the window key. */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRank = Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")
    Tables.events(spark, dir).select(
      $"user_id", $"event_id",
      row_number().over(w).as("rn"),
      lag($"value", 1).over(w).as("prev_value"),
      lead($"value", 1).over(w).as("next_value"),
      sum(dec($"value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("run_sum"),
      rank().over(wRank).as("value_rank"))
      .orderBy($"user_id", $"rn")
  }

  val windowFuncsSql: String =
    """SELECT user_id, event_id,
      |  row_number() OVER w AS rn,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS run_sum,
      |  rank() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS value_rank
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, rn""".stripMargin

  /** §2.8 — top-k: orderBy desc + limit plans as TakeOrderedAndProject —
    * per-partition heaps of size k, only k rows to the driver-side take;
    * the 100 TB-safe top-k (verified in the plan spec). */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .orderBy($"value".desc, $"event_id")
      .limit(10)
      .select($"event_id", $"user_id", $"value")
  }

  val topKSql: String =
    """SELECT event_id, user_id, value
      |FROM events ORDER BY value DESC, event_id LIMIT 10""".stripMargin

  /** §2.9 — set operations over derived key sets (the ack ∪ nack
    * partition semantics of reference main.go:184-197). */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    e.filter($"event_type" === "purchase").select($"user_id")
      .union(e.filter($"event_type" === "signup").select($"user_id"))
      .distinct()
      .orderBy($"user_id")
  }

  val setUnionSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |UNION
      |SELECT user_id FROM events WHERE event_type = 'signup'
      |ORDER BY user_id""".stripMargin

  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    e.filter($"event_type" === "purchase").select($"user_id")
      .intersect(e.filter($"event_type" === "error").select($"user_id"))
      .orderBy($"user_id")
  }

  val setIntersectSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    e.filter($"event_type" === "purchase").select($"user_id")
      .except(e.filter($"event_type" === "error").select($"user_id"))
      .orderBy($"user_id")
  }

  val setExceptSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin
}
