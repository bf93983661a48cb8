package graft

import graft.functions.AvroDecodeIngestion
import graft.streaming.IngestPipeline
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream

/** The real Avro wire decode (S2) and the SQL-registered custom
  * functions (SparkSessionExtensions). */
class AvroAndExtensionsSpec extends SparkSpec {

  private val schema = new Schema.Parser().parse(AvroDecodeIngestion.SchemaJson)

  private def avroBytes(uuid: String, ms: Long, tags: Seq[(String, String)]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("identifier", "id1"); rec.put("name", "n"); rec.put("uuid", uuid)
    rec.put("type", "t"); rec.put("ingestion_time", ms)
    if (tags.nonEmpty) {
      val tagSchema = schema.getField("tags").schema().getTypes.get(1)
      val arr = new GenericData.Array[GenericRecord](tags.size, tagSchema)
      tags.foreach { case (k, v) =>
        val t = new GenericData.Record(tagSchema.getElementType)
        t.put("type", k); t.put("value", v); arr.add(t)
      }
      rec.put("tags", arr)
    }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("avro round-trip: encode with avro-core, decode with the expression") {
    import spark.implicits._
    val df = Seq(avroBytes("u1", 1700000000000L, Seq("a" -> "1", "b" -> "2")))
      .toDF("value")
      .select(AvroDecodeIngestion.avroDecode($"value").as("rec"))
    val r = df.select($"rec.uuid", $"rec.ingestion_time", size($"rec.tags")).head()
    assert(r.getString(0) == "u1")
    assert(r.getLong(1) == 1700000000000L)
    assert(r.getInt(2) == 2)
  }

  test("malformed avro bytes decode to null (DLQ semantics), null tags survive") {
    import spark.implicits._
    val df = Seq(
      ("ok", avroBytes("u2", 1L, Seq.empty)),
      ("garbage", Array[Byte](1, 2, 3))).toDF("label", "value")
      .select($"label", AvroDecodeIngestion.avroDecode($"value").as("rec"))
    val byLabel = df.collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(!byLabel("ok"))
    // note: Avro binary is not self-describing; truncated-but-parseable
    // prefixes can decode — 3 arbitrary bytes cannot (EOF inside fields)
    assert(byLabel("garbage"))
  }

  test("streaming pipeline over real avro bytes (parseAvro end-to-end)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    mem.addData(avroBytes("av1", 1700000000000L, Seq("k" -> "v")),
      Array[Byte](9, 9, 9))
    val parsed = IngestPipeline.parseAvro(mem.toDF())
    val q = parsed.writeStream.format("memory").queryName("avro_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("avrock").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("avro_out")
    assert(out.filter($"valid").count() == 1)
    assert(out.filter(!$"valid").count() == 1)
    assert(out.filter($"valid").select($"rec.uuid").head().getString(0) == "av1")
  }

  test("reader schema loads from a configured file path (DATA_SCHEMA seam)") {
    import spark.implicits._
    // a schema file with a doc annotation the embedded text lacks — the
    // rotate-without-rebuild case the file seam exists for
    val rotated = AvroDecodeIngestion.SchemaJson
      .replace("\"fields\"", "\"doc\":\"rotated\",\"fields\"")
    val p = java.nio.file.Files.createTempFile("ingestion", ".avsc")
    java.nio.file.Files.writeString(p, rotated)
    val text = graft.model.Schemas.fromFile(p.toString)
    assert(text == rotated)
    // decode end-to-end through the file-loaded schema (batch frame —
    // parseAvro is a plain transform)
    val r = IngestPipeline.parseAvro(
      Seq(avroBytes("sf1", 7L, Seq("a" -> "b"))).toDF("value"), text)
      .select($"valid", $"rec.uuid").head()
    assert(r.getBoolean(0) && r.getString(1) == "sf1")
    // resolution order: explicit path wins; no path -> embedded fallback
    assert(graft.model.Schemas.resolveAvroSchema("EMBEDDED", Some(p.toString)) == rotated)
    assert(graft.model.Schemas.resolveAvroSchema("EMBEDDED", None) == "EMBEDDED")
    // bad schema text or missing file fails at boot, not per-record
    val bad = java.nio.file.Files.createTempFile("bad", ".avsc")
    java.nio.file.Files.writeString(bad, "{this is not an avro schema")
    intercept[Exception] { graft.model.Schemas.fromFile(bad.toString) }
    intercept[Exception] { graft.model.Schemas.fromFile("/nonexistent/schema.avsc") }
  }

  test("vec_dot is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("vec_dot yields NULL on mismatched vector lengths (oracle NULL-propagation)") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT))) AS d").head()
    assert(r.isNullAt(0))
  }

  test("vec_dot with wrong argument count is a clean analysis error, not an IOOBE") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").head()
    }
    assert(e.getMessage.contains("vec_dot"))
  }

  test("vec_signword packs sign bits; >64 components yield NULL") {
    // v[0] > 0 → bit 0; v[2] > 0 → bit 2; zero/negative clear
    val r = spark.sql(
      "SELECT vec_signword(array(CAST(0.5 AS FLOAT), " +
        "CAST(-1.0 AS FLOAT), CAST(2.0 AS FLOAT), " +
        "CAST(0.0 AS FLOAT))) AS w").head()
    assert(r.getLong(0) == ((1L << 0) | (1L << 2)))
    // a 65-component vector must NULL, never rank by a truncated word
    val big = (1 to 65).map(_ => "CAST(1.0 AS FLOAT)").mkString(", ")
    assert(spark.sql(s"SELECT vec_signword(array($big)) AS w")
      .head().isNullAt(0))
    // native expression agrees with the 64-when chain it replaced
    val chain = spark.sql(
      "SELECT vec_signword(array(CAST(-0.1 AS FLOAT), " +
        "CAST(3.5 AS FLOAT))) AS w").head().getLong(0)
    assert(chain == (1L << 1))
  }

  test("avro_decode_ingestion is callable from SQL via GraftExtensions") {
    import spark.implicits._
    Seq(avroBytes("sq1", 5L, Seq.empty)).toDF("value").createOrReplaceTempView("raw_avro")
    val r = spark.sql("SELECT avro_decode_ingestion(value).uuid AS u FROM raw_avro").head()
    assert(r.getString(0) == "sq1")
  }

  test("stateful runningCounts accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def json(id: String, ms: Long): String =
      s"""{"identifier":"$id","name":"n","uuid":"u$ms","type":"t","ingestion_time":$ms,"tags":[{"type":"k","value":"v"}]}"""
    val mem = MemoryStream[String]
    val q = IngestPipeline.runningCounts(mem.toDF())
      .writeStream.format("memory").queryName("stats_out")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("statck").toString)
      .start()
    try {
      mem.addData(json("A", 1), json("A", 2), json("B", 3))
      q.processAllAvailable()
      mem.addData(json("A", 4))
      q.processAllAvailable()
    } finally q.stop()
    // memory sink in update mode appends each update; take the latest per key
    val latest = spark.table("stats_out")
      .groupBy($"identifier")
      .agg(max($"n_records").as("n_records"), max($"n_tags").as("n_tags"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(latest("A") == ((3L, 3L)), s"got $latest")
    assert(latest("B") == ((1L, 1L)))
  }

  test("runningCountsTws accumulates and TTL-expired keys restart from zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def json(id: String, ms: Long): String =
      s"""{"identifier":"$id","name":"n","uuid":"u$ms","type":"t","ingestion_time":$ms,"tags":[{"type":"k","value":"v"}]}"""
    // transformWithState requires the RocksDB state store provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[String]
      // a real trigger interval + deadline-POLLING, not
      // processAllAvailable: with a state TTL the engine keeps running
      // no-data batches to advance processing time, so quiescence (which
      // processAllAvailable waits for) never comes — the same livelock
      // the flatMapGroupsWithState TTL test documents
      val q = IngestPipeline.runningCountsTws(mem.toDF(),
        stateTtl = Some(java.time.Duration.ofMillis(150)))
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("twsck").toString)
        .start()
      def pollARows(expect: Seq[Long]): Seq[Long] = {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var got = Seq.empty[Long]
        while (got != expect && System.nanoTime() < deadline) {
          Thread.sleep(100)
          got = spark.table("tws_out").filter($"identifier" === "A")
            .select($"n_records").collect().map(_.getLong(0)).sorted.toSeq
        }
        got
      }
      try {
        mem.addData(json("A", 1), json("A", 2))
        assert(pollARows(Seq(2L)) == Seq(2L), "batch 1 should accumulate A to 2")
        Thread.sleep(600) // let the 150 ms value TTL lapse in wall-clock
        mem.addData(json("A", 3))
        // batch 1 emitted 2 (accumulated); the post-TTL batch emits 1:
        // expired state reads as absent and the key restarts from zero
        val aRows = pollARows(Seq(1L, 2L))
        assert(aRows == Seq(1L, 2L),
          s"expected TTL-expired A to restart from zero, got $aRows")
      } finally q.stop()
    } finally {
      prevProv match {
        case Some(p) => spark.conf.set(provKey, p)
        case None    => spark.conf.unset(provKey)
      }
    }
  }

  test("runningCounts state expires after the TTL and re-registers from zero") {
    // Deterministic unit test of the state TRANSITION via TestGroupState
    // (the public harness Spark ships for exactly this): the timeout's
    // scheduling is the engine's contract; what is OURS to verify is
    // that an expired key drops its state and a returning key restarts
    // from zero. A wall-clock streaming variant (1 ms TTL +
    // processAllAvailable) livelocks: ProcessingTimeTimeout makes the
    // engine run no-data batches continuously to evaluate pending
    // timeouts, so quiescence never comes.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val ttl = Some("30 minutes")
    val update = IngestPipeline.runningCountsUpdate(ttl) _

    // 1) two records for A accumulate and arm the timeout
    val s1 = TestGroupState.create[graft.streaming.IdentifierStats](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = false)
    val out1 = update("A", Iterator(("A", 2), ("A", 3)), s1).toSeq
    assert(out1.map(o => (o.n_records, o.n_tags)) == Seq((2L, 5L)))
    assert(s1.getTimeoutTimestampMs.isPresent, "TTL must arm a timeout")
    assert(s1.getTimeoutTimestampMs.get() == 1000L + 30L * 60 * 1000)

    // 2) the timeout fires: state is dropped, nothing emitted
    val s2 = TestGroupState.create[graft.streaming.IdentifierStats](
      Optional.of(out1.head), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, Optional.empty[Long](), hasTimedOut = true)
    assert(update("A", Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved, "expired state must be removed")

    // 3) A returns after expiry: counter restarts at 1, not 3
    val s3 = TestGroupState.create[graft.streaming.IdentifierStats](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 3000L, Optional.empty[Long](), hasTimedOut = false)
    val out3 = update("A", Iterator(("A", 1)), s3).toSeq
    assert(out3.map(o => (o.n_records, o.n_tags)) == Seq((1L, 1L)),
      s"expected A to re-register from zero after TTL, got $out3")

    // 4) without a TTL no timeout is ever armed (the default path)
    val s4 = TestGroupState.create[graft.streaming.IdentifierStats](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 4000L, Optional.empty[Long](), hasTimedOut = false)
    IngestPipeline.runningCountsUpdate(None)("B", Iterator(("B", 1)), s4).toSeq
    assert(!s4.getTimeoutTimestampMs.isPresent)
  }
}
