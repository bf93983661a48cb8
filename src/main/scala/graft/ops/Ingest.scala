package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's own operator surface (SURVEY.md §2.1–2.4, §2.10–2.11),
  * expressed as batch DataFrame queries over the `events` fixture so the
  * driver's DuckDB oracle can check them.
  *
  * The reference pipeline (reference main.go:131-202) is:
  * Avro decode → validate/split → ToIndex projection/enrichment →
  * micro-batch → bulk index with DocumentID=uuid (idempotent upsert) →
  * ack/nack by success-set membership → DLQ for poison messages.
  * Each stage is registered here as a standalone relational query; the
  * streaming assembly of the same stages lives in graft.stream.
  *
  * Scale notes (100 TB): every query here is a narrow projection/filter
  * (no shuffle) or a key-partitioned window/join whose shuffle key is the
  * natural partition key (user_id / date). Nothing collects to the driver.
  */
object Ingest {

  /** P1 — the ToIndex projection/enrichment (reference model.go:28-44):
    * pass-through ids, epoch-millis handling (model.go:31), JSON props
    * extraction (the Avro-payload decode analogue), stable uuid derivation
    * (the ES DocumentID, reference es.go:185), and the daily partition
    * date that models the daily rolling index (reference es.go:79-81).
    * `persist_time = now()` (model.go:30) is deliberately excluded here —
    * non-deterministic, so oracle-incomparable; it is exercised in
    * [[ingestEnrich]] and the streaming pipeline instead.
    * Plan: narrow codegen'd projection; Tables.par spreads the md5/JSON
    * per-row compute across cores (single-row-group fixture scan).
    */
  def ingestTransform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir)).select(
      $"event_id",
      md5(concat_ws(":", $"event_id", $"user_id")).as("uuid"),
      $"user_id",
      $"event_type".as("type"),
      unix_millis($"ts").as("ingestion_ms"),
      get_json_object($"props", "$.k").cast("int").as("k"),
      date_format($"ts", "yyyy-MM-dd").as("persist_date"))
      .orderBy($"event_id")
  }

  val ingestTransformSql: String =
    """SELECT event_id,
      |  md5(concat_ws(':', event_id, user_id)) AS uuid,
      |  user_id,
      |  event_type AS type,
      |  epoch_ms(ts) AS ingestion_ms,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |  strftime(ts, '%Y-%m-%d') AS persist_date
      |FROM events ORDER BY event_id""".stripMargin

  /** P1 + F2/F4 — the enrichment variant WITH `persist_time = now()` and
    * the JSON serialization the bulk indexer performs (reference es.go:176
    * `json.Marshal`). Registered without an oracle (current_timestamp is
    * non-deterministic): driver records a rows-only check.
    */
  def ingestEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingestTransform(spark, dir)
      .withColumn("persist_time", current_timestamp())
      .withColumn("doc", to_json(struct($"event_id", $"uuid", $"type", $"k")))
  }

  /** P2 — the parse-validate success branch (reference main.go:131-143):
    * records whose payload decodes under the fixed schema. `from_json`
    * stands in for the Avro wire decode (S2; no spark-avro jar in this
    * environment — SURVEY §7.3). Narrow filter; at scale the JSON parse
    * is codegen'd per-row, no shuffle. */
  def parseValid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir))
      .withColumn("k", from_json($"props", lit("k INT")).getField("k"))
      .filter($"k".isNotNull)
      .select($"event_id", $"k")
      .orderBy($"event_id")
  }

  val parseValidSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events
      |WHERE json_valid(props) AND json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** P2/ST4/K3 — the DLQ branch: records failing the decode predicate
    * (reference main.go:136-141 → pulsar.go:97-100 DLQ policy). Together
    * with [[parseValid]] the two row counts partition the table — the
    * ack ∪ nack invariant of SURVEY §2.9. */
  def parseDlq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir))
      .withColumn("k", from_json($"props", lit("k INT")).getField("k"))
      .filter($"k".isNull)
      .select($"event_id", $"props")
      .orderBy($"event_id")
  }

  val parseDlqSql: String =
    """SELECT event_id, props
      |FROM events
      |WHERE NOT (json_valid(props) AND json_extract_string(props, '$.k') IS NOT NULL)
      |ORDER BY event_id""".stripMargin

  /** K2 — idempotent-upsert / last-writer-wins by key (reference es.go:185
    * `DocumentID: a.Uuid`): batch form is latest-record-per-key via a
    * ranking window. Key = user_id, recency = (ts, event_id) for a total
    * order. Scale: single hash-partitioned shuffle on the key, state is
    * one row per key per partition — the canonical dedup shape at 100 TB
    * (vs dropDuplicates, same plan; window form also yields the ordering).
    */
  def dedupByKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"))
      .orderBy($"user_id")
  }

  val dedupByKeySql: String =
    """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
      |FROM (SELECT user_id, event_id, ts,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** P3 (ack half) — success-set membership as a LEFT SEMI join (the
    * *intended* semantics of reference main.go:184-197; the reference's
    * own loop has the `found`-flag bug documented in SURVEY §2.2). The
    * "succeeded" key set here = users with a purchase event. Scale: the
    * distinct key set is small → Spark broadcasts it (BroadcastHashJoin,
    * no shuffle of the big side). */
  def ackSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val succeeded = events.filter($"event_type" === "purchase").select($"user_id").distinct()
    events.join(succeeded, Seq("user_id"), "left_semi")
      .select($"event_id", $"user_id")
      .orderBy($"event_id")
  }

  val ackSemiJoinSql: String =
    """SELECT event_id, user_id FROM events e
      |WHERE EXISTS (SELECT 1 FROM events s WHERE s.user_id = e.user_id AND s.event_type = 'purchase')
      |ORDER BY event_id""".stripMargin

  /** P3 (nack half) — the complement as a LEFT ANTI join: records whose
    * key is NOT in the success set get nacked → redelivered → DLQ. */
  def nackAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val succeeded = events.filter($"event_type" === "purchase").select($"user_id").distinct()
    events.join(succeeded, Seq("user_id"), "left_anti")
      .select($"event_id", $"user_id")
      .orderBy($"event_id")
  }

  val nackAntiJoinSql: String =
    """SELECT event_id, user_id FROM events e
      |WHERE NOT EXISTS (SELECT 1 FROM events s WHERE s.user_id = e.user_id AND s.event_type = 'purchase')
      |ORDER BY event_id""".stripMargin

  /** K4 — daily rolling index ≈ daily partition layout (reference
    * es.go:78-116: index named {INDEX}_{yyyy-MM-dd} + alias). Batch form:
    * derive the partition date and count per partition — the partition
    * manifest a `partitionBy("persist_date")` write would produce.
    * Scale: partial/final hash agg on a low-cardinality date key. */
  def dailyPartitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("persist_date"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"persist_date")
  }

  val dailyPartitionsSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS persist_date, COUNT(*) AS n_docs
      |FROM events GROUP BY 1 ORDER BY persist_date""".stripMargin

  /** F1–F8 — the complete scalar-function surface of the reference
    * (SURVEY §2.10) in one projection: date_format (F3, es.go:79-81),
    * to_json (F4, es.go:176), format_string (F6, es.go:83), contains
    * (F7, es.go:93), element_at (F8, model.go:40), epoch millis (F1,
    * model.go:31), plus the string basics. Narrow, codegen'd, no shuffle.
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir)).select(
      $"event_id",
      unix_millis($"ts").as("f1_ms"),
      date_format($"ts", "yyyy-MM-dd").as("f3_date"),
      to_json(struct($"event_id", $"event_type")).as("f4_json"),
      format_string("%s_%d", $"event_type", $"user_id").as("f6_fmt"),
      $"event_type".contains("err").as("f7_contains"),
      element_at(array($"event_type", $"props"), 1).as("f8_elem"),
      upper($"event_type").as("s_upper"),
      substring($"event_type", 1, 3).as("s_sub"))
      .orderBy($"event_id")
  }

  val scalarFuncsSql: String =
    """SELECT event_id,
      |  epoch_ms(ts) AS f1_ms,
      |  strftime(ts, '%Y-%m-%d') AS f3_date,
      |  CAST(to_json(struct_pack(event_id := event_id, event_type := event_type)) AS VARCHAR) AS f4_json,
      |  printf('%s_%d', event_type, user_id) AS f6_fmt,
      |  contains(event_type, 'err') AS f7_contains,
      |  list_extract([event_type, props], 1) AS f8_elem,
      |  upper(event_type) AS s_upper,
      |  substring(event_type, 1, 3) AS s_sub
      |FROM events ORDER BY event_id""".stripMargin

  /** The tags data-model shape (reference index_topic.avro:26-50, ES
    * nested mapping.json:41-56): build a tags array<struct<type,value>>
    * from each event and explode it — the only table-generating operator
    * the reference's data model implies (SURVEY §2.12). Narrow explode,
    * output ~2× input rows, no shuffle. */
  def explodeTags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir))
      .select($"event_id", explode(array(
        struct(lit("etype").as("type"), $"event_type".as("value")),
        struct(lit("k").as("type"), get_json_object($"props", "$.k").as("value")))).as("tag"))
      .select($"event_id", $"tag.type".as("type"), $"tag.value".as("value"))
      .orderBy($"event_id", $"type")
  }

  val explodeTagsSql: String =
    """SELECT event_id, tag.type AS type, tag.value AS value
      |FROM (SELECT event_id,
      |        UNNEST([struct_pack(type := 'etype', value := event_type),
      |                struct_pack(type := 'k', value := json_extract_string(props, '$.k'))]) AS tag
      |      FROM events)
      |ORDER BY event_id, type""".stripMargin

  /** Nested-tag predicate — the ES query surface over the nested tags
    * mapping (`exists` on a tag value, SURVEY §2.2 "general predicate
    * surface"). The tags array is constructed in the same projection, so
    * `exists(tags, t -> t.value = 'error')` folds to a plain boolean over
    * the two element values — a codegen'd predicate. (The literal
    * higher-order `exists` evaluates interpreted per row and benched
    * 18.5 s for 100k rows in r2; the folded predicate is the same
    * semantics at codegen speed. For a STORED tags column, predicate
    * shape would be `exists` or explode+filter.) */
  def tagsExists(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir))
      .filter($"event_type" === "error" ||
        get_json_object($"props", "$.k") === "error")
      .select($"event_id", $"event_type")
      .orderBy($"event_id")
  }

  /** The downstream ES query surface (SURVEY §2.2 "general predicate
    * surface"): the three predicate classes the reference's index serves
    * — keyword equality (`event_type` ≈ the keyword-mapped fields,
    * mapping.json:21-23), full-text contains (`props` ≈ the text-mapped
    * fields, mapping.json:13-20), and an ingestion-date range
    * (mapping.json:32-37) — in one conjunctive filter. Narrow codegen'd
    * scan+filter; equality/contains push to the parquet footer (the ts
    * range is compared post-conversion from the fixture's NANOS shim —
    * see Tables.events). */
  def searchFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "purchase" &&
        $"props".contains("1") &&
        $"ts" >= lit("2024-01-08 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-22 00:00:00").cast("timestamp"))
      .select($"event_id", $"user_id", unix_millis($"ts").as("ts_ms"))
      .orderBy($"event_id")
  }

  val searchFilterSql: String =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
      |FROM events
      |WHERE event_type = 'purchase' AND contains(props, '1')
      |  AND ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'
      |ORDER BY event_id""".stripMargin

  /** K4 second half — the `{INDEX}` alias indirection (reference
    * es.go:102-116 `addAlias`): the daily rolling "index" is a
    * persist_date partition of the sink table; the alias is a view
    * pinned to the current date. Repointing is an atomic
    * CREATE OR REPLACE VIEW (the reference repoints the ES alias at
    * boot the same way); readers through the alias get partition
    * pruning because the view's date predicate reaches the scan's
    * PartitionFilters (asserted in StorageSpec). */
  def pointIndexAlias(spark: SparkSession, alias: String,
      tableDir: String, date: String): Unit = {
    // interpolated into SQL text — reject anything that could escape
    // its quoting context (a malformed date would otherwise silently
    // widen the view's predicate)
    require(date.matches("\\d{4}-\\d{2}-\\d{2}"),
      s"date must be yyyy-MM-dd, got: $date")
    require(!alias.contains("`"), s"alias must not contain backticks: $alias")
    // tableDir sits between backticks, where only a backtick can escape
    // (apostrophes in paths are legitimate and harmless there)
    require(!tableDir.contains("`"),
      s"tableDir must not contain backticks: $tableDir")
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW `$alias` AS " +
        s"SELECT * FROM parquet.`$tableDir` WHERE persist_date = '$date'")
    ()
  }

  /** The INGEST corpus as a searchable document frame — the shape the
    * reference actually indexes (index_topic.avro:26-50, ES
    * mapping.json): doc_id = event_id, the analyzed text field =
    * event_type, the NESTED `tags` array<struct<type,value>> (one tag
    * per (etype, k) pair — the [[explodeTags]] model, kept nested),
    * and the ts-derived persist_date the daily rolling index keys on
    * (es.go:79-81). This is the corpus [[Dsl]] nested queries and the
    * daily ingest indices serve. */
  def ingestDocs(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Tables.par(Tables.events(spark, dir)).select(
      $"event_id".as("doc_id"),
      $"event_type".as("text"),
      array(
        struct(lit("etype").as("type"), $"event_type".as("value")),
        struct(lit("k").as("type"),
          get_json_object($"props", "$.k").as("value"))).as("tags"),
      date_format($"ts", "yyyy-MM-dd").as("persist_date"))
  }

  /** The oracle-side relation of [[ingestDocs]]. */
  val IngestDocsRel: String =
    """(SELECT event_id AS doc_id, event_type AS text,
      |  [struct_pack(type := 'etype', value := event_type),
      |   struct_pack(type := 'k',
      |     value := json_extract_string(props, '$.k'))] AS tags,
      |  strftime(ts, '%Y-%m-%d') AS persist_date
      | FROM events)""".stripMargin

  val tagsExistsSql: String =
    """SELECT event_id, event_type
      |FROM (SELECT event_id, event_type,
      |        [struct_pack(type := 'etype', value := event_type),
      |         struct_pack(type := 'k', value := json_extract_string(props, '$.k'))] AS tags
      |      FROM events)
      |WHERE len(list_filter(tags, t -> t.value = 'error')) > 0
      |ORDER BY event_id""".stripMargin
}
