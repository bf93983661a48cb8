package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining relational breadth: multiset operations, pivot, and a
  * bucketed interval (range) self-join — each absent in the reference
  * (SURVEY §2.5/§2.9) and oracle-checked. */
object Extras {

  /** §2.9 — INTERSECT ALL: multiset semantics (duplicates preserved by
    * min multiplicity), vs the set variants already registered. */
  def setIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    e.filter($"event_type" === "purchase").select($"user_id")
      .intersectAll(e.filter($"event_type" === "error").select($"user_id"))
      .orderBy($"user_id")
  }

  val setIntersectAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |INTERSECT ALL
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** §2.9 — EXCEPT ALL: multiset difference. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    e.filter($"event_type" === "purchase").select($"user_id")
      .exceptAll(e.filter($"event_type" === "error").select($"user_id"))
      .orderBy($"user_id")
  }

  val setExceptAllSql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |EXCEPT ALL
      |SELECT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** §2.6 — pivot: per-user event-type counts as columns. The value list
    * is explicit so the plan needs no discovery pass (at 100 TB an
    * unlisted pivot first scans for distinct values). Nulls (user never
    * produced a type) are filled with 0 to match COUNT FILTER semantics. */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy($"user_id")
  }

  val pivotCountsSql: String = {
    val cols = EventTypes
      .map(t => s"""count(*) FILTER (WHERE event_type = '$t') AS "$t"""")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** §2.5 — interval (range) self-join, bucketed: pairs of same-user
    * events within 60 s of each other. The scale-safe shape for range
    * joins: quantize time into join-width buckets, equi-join on
    * (key, bucket) with one side exploded to its 3 neighboring buckets,
    * then apply the exact range predicate — turns an unbounded range
    * cross-product into an equi-join Catalyst can hash-partition; each
    * qualifying pair matches exactly one bucket equality (no dedup
    * needed). */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val WindowMs = 60000L
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      .withColumn("bucket", floor($"ms" / WindowMs))
    val b = e.select($"user_id".as("u2"), $"event_id".as("id_b"), $"ms".as("ms_b"),
      explode(array($"bucket" - 1, $"bucket", $"bucket" + 1)).as("jb"))
    e.join(b, $"user_id" === $"u2" && $"bucket" === $"jb" && $"event_id" < $"id_b")
      .filter(abs($"ms" - $"ms_b") <= WindowMs)
      .select($"event_id".as("id_a"), $"id_b", abs($"ms" - $"ms_b").as("dt_ms"))
      .orderBy($"id_a", $"id_b")
  }

  val rangeJoinBucketedSql: String =
    """SELECT a.event_id AS id_a, b.event_id AS id_b,
      |  abs(epoch_ms(a.ts) - epoch_ms(b.ts)) AS dt_ms
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 60000
      |ORDER BY id_a, id_b""".stripMargin

  /** Edit-distance verification of near-dup candidates: levenshtein over
    * the jaccard-confirmed pairs only (the standard funnel — LSH prunes
    * n², jaccard prunes candidates, the O(len²) string DP runs on the
    * survivors). Both engines implement standard Levenshtein. */
  def dedupEditDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Build side must be the PAIRS (post-funnel, tiny), never the text
    // table: the pair frame is a checkpointed RDD with no stats, so
    // without the hints Spark sizes only the parquet side and broadcasts
    // the ENTIRE text corpus — twice (measured 2.5 s at sf0.1; ~50 MB of
    // strings shipped per join; at 100 TB an OOM). With the hints each
    // join builds a few-hundred-row hash table and probes the text scan,
    // and the levenshtein DP runs inside the scan's partitions.
    // documentsPar: the single-row-group fixture scan is one task —
    // repartition spreads the probe (and the O(len²) DP) across cores.
    val texts = Tables.documentsPar(spark, dir).select($"doc_id", $"text")
    // sharedJaccardPairs: the session-shared materialized funnel output
    // (unordered — the registered dedup_jaccard's ORDER BY would be dead
    // weight below this join)
    val pairs = Dedup.sharedJaccardPairs(spark, dir)
    val withA = broadcast(pairs)
      .join(texts.select($"doc_id".as("id_a"), $"text".as("text_a")), "id_a")
    broadcast(withA)
      .join(texts.select($"doc_id".as("id_b"), $"text".as("text_b")), "id_b")
      .select($"id_a", $"id_b", levenshtein($"text_a", $"text_b").as("edit_dist"))
      .orderBy($"id_a", $"id_b")
  }

  val dedupEditDistSql: String =
    s"""WITH jp AS (${Dedup.dedupJaccardSql.replace("ORDER BY id_a, id_b", "")})
       |SELECT jp.id_a, jp.id_b, levenshtein(da.text, db.text) AS edit_dist
       |FROM jp
       |JOIN documents da ON da.doc_id = jp.id_a
       |JOIN documents db ON db.doc_id = jp.id_b
       |ORDER BY id_a, id_b""".stripMargin
}

/** Per-group top-k and ordered collect — §2.7/§2.8 companions. */
object GroupTop {

  /** Top-3 events by value per event_type via ranking window — the
    * per-group top-k shape (per-key heap after one hash partition; never
    * a global sort). */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value".desc, $"event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"event_type", $"rn", $"event_id", $"value")
      .orderBy($"event_type", $"rn")
  }

  val topKPerGroupSql: String =
    """SELECT event_type, rn, event_id, value
      |FROM (SELECT event_type, event_id, value,
      |        row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      |      FROM events)
      |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin

  /** Ordered collect: per event_type, the sorted distinct user list as a
    * string (strings, not arrays, so the driver's column-hash compare is
    * representation-stable across engines). */
  def aggCollect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(concat_ws(",", sort_array(collect_set($"user_id"))).as("users"))
      .orderBy($"event_type")
  }

  val aggCollectSql: String =
    """SELECT event_type,
      |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}

/** Skew-mitigation pattern: two-phase salted aggregation. */
object Salted {

  /** Counts+sums per event_type computed with an explicit salt: phase 1
    * aggregates (key, salt) — spreading a hot key over 16 reducers —
    * phase 2 merges the partials per key. Results are identical to the
    * direct groupBy (the oracle is the plain GROUP BY); the value is the
    * shape: when one key dominates (boilerplate docs, null keys), the
    * first shuffle stays balanced. AQE's skew handling covers joins;
    * salting is the aggregation-side tool. Sums stay in DECIMAL until
    * after the final merge so the two-phase result is bit-stable. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val acc = DecimalType(38, 18)
    Tables.events(spark, dir)
      .withColumn("salt", pmod($"event_id", lit(16L)))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("c"), sum($"value".cast(acc)).as("s"))
      .groupBy($"event_type")
      .agg(sum($"c").as("cnt"), sum($"s").cast("double").as("sum_value"))
      .orderBy($"event_type")
  }

  val saltedAggSql: String =
    """SELECT event_type, COUNT(*) AS cnt,
      |  CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
