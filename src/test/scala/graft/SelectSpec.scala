package graft

import graft.ops.Select
import org.apache.spark.sql.functions._

/** Data-selection invariants the row/hash oracle can't express: the
  * DSIR weight actually carries the target-domain signal (docs written
  * in the target slice's vocabulary outscore docs that aren't), the
  * resample predicate is the weight acting as an acceptance
  * probability, the CCNet buckets order by score and roughly third the
  * corpus, and the serving plans broadcast the model tables. */
class SelectSpec extends SparkSpec {

  import spark.implicits._

  /** Synthetic pool: target sources (src0) write in vocabulary A;
    * off-domain docs (src9) in disjoint vocabulary B; mixed docs half
    * and half. DSIR should rank A-docs >> mixed >> B-docs. */
  private val TextA = "alpha beta gamma delta epsilon zeta eta theta"
  private val TextB = "one two three four five six seven eight"
  private val TextMix = "alpha two gamma four epsilon six eta eight"

  private lazy val domainCorpus = {
    val rows =
      (0L until 40L).map(i => (i, TextA, "en", "src0")) ++
        (40L until 60L).map(i => (i, TextB, "en", "src9")) ++
        (60L until 80L).map(i => (i, TextMix, "en", "src9"))
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("dsir weights rank on-domain text above off-domain text") {
    val w = Select.dsirWeightsOf(domainCorpus)
      .join(domainCorpus.select($"doc_id", $"text"), "doc_id")
      .groupBy($"text").agg(avg($"weight").as("mw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (onW, offW, mixW) = (w(TextA), w(TextB), w(TextMix))
    info(f"mean weight: on-domain $onW%.0f, mixed $mixW%.0f, off-domain $offW%.0f")
    // B-vocabulary grams occur only outside the target slice, so their
    // buckets carry (near-)zero target mass — up to md5-bucket
    // collisions with A-grams, which the margin absorbs
    assert(onW > 2 * offW + 1,
      "target-vocabulary docs must far outscore off-domain docs")
    assert(onW > mixW && mixW > offW,
      "mixed-vocabulary docs must land between the pure pools")
  }

  test("every document gets a weight in [0, Scale]") {
    val w = Select.dsirWeightsOf(domainCorpus)
    assert(w.count() == domainCorpus.count())
    val row = w.agg(min($"weight"), max($"weight")).head()
    assert(row.getLong(0) >= 0L && row.getLong(1) <= Select.RatioScale)
  }

  test("dsir_sample is the weight acting as an acceptance probability") {
    val w = Select.dsirWeightsOf(domainCorpus).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val kept = Select.dsirSampleOf(domainCorpus).collect()
      .map(_.getLong(0)).toSet
    // recompute the salted-hash predicate row by row
    val expect = w.collect { case (id, wt)
      if java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"dsir:$id").substring(0, 15), 16)
        % Select.RatioScale < wt => id
    }.toSet
    assert(kept == expect)
    // acceptance is monotone in weight at the population level: zero-
    // weight docs never survive, full-weight docs always would
    assert(kept.intersect(w.filter(_._2 == 0L).keySet).isEmpty)
  }

  test("an all-target pool weights everything at Scale and keeps everything") {
    // when the pool IS the target slice, every bucket has p_b == q_b
    // regardless of hash collisions: weight is exactly Scale, and the
    // acceptance predicate (h mod Scale < Scale) always holds — DSIR
    // degrades to the identity when there is nothing to tilt toward
    val pure = domainCorpus.filter($"doc_id" < 40L)
    val w = Select.dsirWeightsOf(pure)
    assert(w.filter($"weight" =!= Select.RatioScale).count() == 0)
    assert(Select.dsirSampleOf(pure).count() == 40L)
  }

  test("lm buckets cover every scored doc and order by bin") {
    val b = Select.lmBuckets(spark, sfDir)
    val n = b.count()
    assert(n > 0)
    assert(b.groupBy($"doc_id").count().filter($"count" > 1).count() == 0)
    // within each lang: max tail bin < min middle bin <= max middle
    // bin < min head bin (when the buckets are non-empty)
    val rows = b.groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n"), min($"bin").as("lo"), max($"bin").as("hi"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val langs = rows.keySet.map(_._1)
    for (l <- langs) {
      val t = rows.get((l, "tail")); val m = rows.get((l, "middle"))
      val h = rows.get((l, "head"))
      assert(m.isDefined, s"$l: middle may never be empty")
      t.foreach(tv => assert(tv._3 < m.get._2, s"$l: tail must sit below middle"))
      h.foreach(hv => assert(hv._2 > m.get._3, s"$l: head must sit above middle"))
    }
    val shares = b.groupBy($"bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    info(s"bucket shares: $shares over $n docs")
    // histogram thirds: no bucket may swallow (almost) everything
    assert(shares("middle") < n, "cuts must actually split the corpus")
  }

  test("selection plans broadcast their model tables") {
    // pin the DERIVATION plan via the seam — the registered query now
    // serves from the session-shared checkpoint, whose scan hides the
    // build it materialized (the sharedKmeansRows stance)
    val wPlan = Select.dsirWeightsOf(Tables.documentsPar(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(wPlan.contains("BroadcastHashJoin"),
      "the B-row ratio table must broadcast to the probe")
    val bPlan = Select.lmBuckets(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"),
      "the per-language bars must broadcast back to the scored frame")
  }

  test("persisted ratios score batch and stream bit-identically to training") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graftdsir").toString
    Select.materializeRatios(spark, sfDir, out)
    val ratios = spark.read.parquet(out)
    val want = Select.dsirWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // batch serving over the same pool == the registered query, exactly
    val batch = Select.scoreWithRatios(
      Tables.documents(spark, sfDir).select($"doc_id", $"text"), ratios)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(batch == want)
    // stream serving: replay a slice as a stream, score at ingest time
    val rows = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData(rows.toSeq)
    val q = Select.scoreWithRatios(mem.toDF.toDF("doc_id", "text"), ratios)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("dsir_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == 50)
    got.foreach { case (id, w) =>
      assert(w == want(id), s"stream weight for doc $id diverged")
    }
  }

  test("arrivals from unseen vocabulary score zero, never error") {
    val ratios = graft.ops.Select.ratiosOf(domainCorpus)
    val novel = Seq((999L, "totally unseen words here"))
      .toDF("doc_id", "text")
    val r = Select.scoreWithRatios(novel, ratios).head()
    // 4 unigrams + 3 bigrams, all hashing to buckets the pool may or
    // may not have produced; target mass must be (near) zero and the
    // gram count full — unseen vocabulary is evidence against the
    // target domain, not an error
    assert(r.getLong(1) == 7L)
    assert(r.getLong(3) < Select.RatioScale / 2)
  }

  test("ensemble votes recompose from the three component queries") {
    val ens = Select.ensembleSelect(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getInt(4), r.getBoolean(5))).toMap
    val docs = Tables.documentsPar(spark, sfDir)
    assert(ens.size == docs.count())
    val cls = graft.ops.Classifier.qualityClassifier(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val dsirKept = Select.dsirSample(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val lm = Select.lmBuckets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    ens.foreach { case (id, (c, d, l, votes, sel)) =>
      assert(c == cls.getOrElse(id, false), s"cls vote diverged for $id")
      assert(d == dsirKept.contains(id), s"dsir vote diverged for $id")
      assert(l == lm.get(id).exists(_ != "tail"), s"lm vote diverged for $id")
      assert(votes == Seq(c, d, l).count(identity))
      assert(sel == (votes >= 2))
    }
    val nSel = ens.values.count(_._5)
    info(s"selected $nSel/${ens.size} by majority vote")
    assert(nSel > 0 && nSel < ens.size,
      "the vote must neither keep nor drop everything on the fixture")
  }

  test("a pool with no target slice degrades deterministically, never errors") {
    // src9-only corpus: the target distribution is EMPTY. DSIR: every
    // bucket has p_b = 0, all weights exactly 0, the resample keeps
    // nothing. CCNet: the LM has no training rows, every doc probes to
    // bin 0, both bars land on 0, everything is 'middle' (nothing
    // strictly below/above the only bin) — defined, deterministic
    // outputs all the way down rather than a divide-by-zero or an
    // empty-aggregate crash
    val rows = (0L until 10L)
      .map(i => (i, TextMix, "en", "src9"))
    val pool = rows.toDF("doc_id", "text", "lang", "source")
    val w = Select.dsirWeightsOf(pool)
    assert(w.count() == 10)
    assert(w.filter($"weight" =!= 0L).count() == 0)
    assert(Select.dsirSampleOf(pool).count() == 0)
    val b = Select.lmBucketsOf(pool).collect()
    assert(b.length == 10)
    assert(b.forall(r => r.getLong(4) == 0L && r.getString(5) == "middle"))
  }

  test("ratio expression survives per-bucket counts at the BIGINT edge") {
    // Drive Select.ratioExpr — the EXACT projection ratiosOf emits —
    // with p_b near 2^63, where the old BIGINT product p_b·Scale
    // silently wrapped under non-ANSI Spark. The DECIMAL(38,0)
    // widening must divide exactly: r_b == floor(p_b·Scale / q_b)
    // computed in BigInt, and the output stays BIGINT (same schema,
    // same oracle hash) because IntegralDivide returns LongType.
    val edge = Seq(
      (1L, Long.MaxValue, Long.MaxValue),           // ratio exactly Scale
      (2L, Long.MaxValue / 2, Long.MaxValue),       // half the pool on-target
      (3L, Long.MaxValue - 1, Long.MaxValue),       // one gram off full mass
      (4L, 1L, Long.MaxValue),                      // vanishing target mass
      (5L, 123456789012345678L, 987654321098765432L))
      .toDF("b", "p_b", "q_b")
    val got = edge.select($"b", Select.ratioExpr.as("r_b"))
    assert(got.schema("r_b").dataType ==
      org.apache.spark.sql.types.LongType)
    val byB = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((b, p, q) <- Seq(
        (1L, Long.MaxValue, Long.MaxValue),
        (2L, Long.MaxValue / 2, Long.MaxValue),
        (3L, Long.MaxValue - 1, Long.MaxValue),
        (4L, 1L, Long.MaxValue),
        (5L, 123456789012345678L, 987654321098765432L))) {
      val want = (BigInt(p) * Select.RatioScale / BigInt(q)).toLong
      assert(byB(b) == want, s"bucket $b: got ${byB(b)}, want $want")
    }
    assert(byB(1L) == Select.RatioScale)
  }

  test("weights and buckets are deterministic across runs") {
    val a = Select.dsirWeights(spark, sfDir).collect().toSeq
    val b = Select.dsirWeights(spark, sfDir).collect().toSeq
    assert(a == b)
    val c = Select.lmBuckets(spark, sfDir).collect().toSeq
    val d = Select.lmBuckets(spark, sfDir).collect().toSeq
    assert(c == d)
  }
}
