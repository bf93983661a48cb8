package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators: deterministic split assignment
  * and token-budget shard packing — the steps between a curated corpus
  * and a training run.
  *
  * Both are narrow/keyed shapes: split assignment is a pure per-row
  * hash projection (no shuffle, no stored split table to drift out of
  * sync — re-derivable anywhere); shard packing is one hash partition
  * per language with a running sum (the same plan class as
  * window_funcs). Nothing global, nothing collected.
  */
object TrainPrep {

  /** Hash bucket (0-99) of an id column under the split keying. */
  private def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(
      conv(substring(md5(concat(lit("split:"), id.cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(100L))

  /** train/val/test label of an id column — the split as a PREDICATE
    * (a pure hash of the id), factored out so audits apply it to any id
    * column in place (Curate.splitLeakage labels both sides of a pair
    * frame with two projections and ZERO joins) instead of joining a
    * materialized split table. */
  def splitExpr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = splitBucket(id)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** Deterministic train/val/test assignment: bucket = md5-hash of the
    * doc id mod 100, split by 80/10/10. Hash-keyed (not random, not
    * modulo-of-id): stable under corpus growth and reshuffling, and any
    * engine can recompute membership — the standard trick for
    * leakage-free splits at corpus scale. */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documentsPar(spark, dir)
      .select($"doc_id", splitBucket($"doc_id").as("bucket"),
        splitExpr($"doc_id").as("split"))
      .orderBy($"doc_id")
  }

  val datasetSplitSql: String =
    """SELECT doc_id, b AS bucket,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |        ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Per-shard token budget (lexer tokens; see TextAnalysis.tokenCount).
    * Small enough that the fixture packs multiple shards per language. */
  val ShardTokenBudget = 5000L

  /** Greedy shard packing: within each language, docs in doc_id order
    * accumulate lexer-token counts; a doc's shard is
    * floor(tokens-before-it / budget) — contiguous shards of ≈budget
    * tokens, computed with one running-sum window per language
    * partition. A GLOBAL pack would serialize on one partition; the
    * partition key bounds parallelism, so at corpus scale it should be
    * high-cardinality (date × source bucket, not a 5-value language
    * column — the fixture keys by lang only because the oracle stays
    * readable; the plan shape is identical for any key). */
  private def packedOf(spark: SparkSession, dir: String,
      carry: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val nTokens = size(regexp_extract_all($"text",
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documentsPar(spark, dir)
      .select(Seq($"doc_id", $"lang", nTokens.as("n_tokens")) ++ carry.map(col): _*)
      .withColumn("cum", sum($"n_tokens").over(w))
      .select(Seq($"doc_id", $"lang", $"n_tokens",
        floor(($"cum" - $"n_tokens") / ShardTokenBudget).as("shard_id")) ++
        carry.map(col): _*)
  }

  def packShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    packedOf(spark, dir).orderBy($"doc_id")
  }

  /** Shard manifest: per (lang, shard) doc count, token total, and
    * doc-id range — the small table a training loader reads to plan
    * shard fetches (and the audit that every shard lands ≈ the token
    * budget). One keyed aggregation downstream of the same
    * running-sum window as [[packShards]]; Spark reuses the window's
    * hash partitioning on lang for the groupBy, so the agg adds no
    * second full shuffle of the packed rows. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    packedOf(spark, dir)
      .groupBy($"lang", $"shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("shard_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"shard_id")
  }


  /** Write the packed shards as the PHYSICAL training artifact:
    * parquet partitioned by (lang, shard_id), each row carrying the doc
    * text and its token count — what [[packShards]]/[[shardManifest]]
    * only PLAN. A training loader then reads the manifest and fetches
    * shard directories by partition path (partition-pruned scans, no
    * corpus filter).
    *
    * Shape at 100 TB: exactly one text-carrying shuffle — the packing
    * window's exchange on the pack key (text rides the same running-sum
    * window [[packShards]] uses; re-joining text by doc_id afterwards
    * would shuffle the text AND pay a join). One file per shard falls
    * out of the plan: all of a pack key's rows sit in one window task,
    * so the partitioned write splits that task's output by shard value
    * — no extra repartition, no small-file spray. TrainPrepSpec asserts
    * the one-file-per-shard invariant and doc/token conservation
    * against [[shardManifest]] after a re-read. */
  def materializeShards(spark: SparkSession, dir: String, outDir: String): Unit =
    packedOf(spark, dir, carry = Seq("text"))
      .write.mode("overwrite").partitionBy("lang", "shard_id").parquet(outDir)

  /** Per-language sampling rates (percent) for the stratified sample:
    * the corpus-mix rebalance every training pipeline runs (down-weight
    * the dominant language, keep the tail). Languages not listed sample
    * at [[DefaultRatePct]]. */
  val SampleRatePct: Seq[(String, Int)] = Seq("en" -> 50)
  val DefaultRatePct = 20

  /** Stratified corpus sampling: deterministic hash-bucket membership
    * per document, thresholded at the stratum's rate — the same
    * hash-keyed trick as [[datasetSplit]] (stable under corpus growth,
    * re-derivable anywhere, leakage-free), so a "sample" is a PREDICATE,
    * not a stored table. Pure narrow projection + filter: no shuffle,
    * no state, embarrassingly parallel at any scale; the bucket column
    * is kept so downstream audits can verify membership. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = pmod(
      conv(substring(md5(concat(lit("sample:"), $"doc_id".cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(100L))
    val rate = SampleRatePct.foldLeft(lit(DefaultRatePct)) {
      case (acc, (l, r)) => when($"lang" === l, lit(r)).otherwise(acc)
    }
    Tables.documentsPar(spark, dir)
      .select($"doc_id", $"lang", bucket.as("bucket"))
      .filter($"bucket" < rate)
      .orderBy($"doc_id")
  }

  val stratifiedSampleSql: String = {
    val cases = SampleRatePct
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang, b AS bucket
       |FROM (SELECT doc_id, lang,
       |        ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
       |      FROM documents)
       |WHERE b < CASE $cases ELSE $DefaultRatePct END
       |ORDER BY doc_id""".stripMargin
  }

  /** Temperature exponent for [[temperatureMix]]. 0.5 (≡ sqrt) on
    * purpose: sqrt is IEEE-correctly-rounded in BOTH engines, so the
    * weights are bit-identical and oracle-able; a general α would route
    * through pow, which libm implementations round differently in the
    * last ulp. 0.5 is also inside the standard range (mT5 uses α=0.3,
    * XLM-R 0.7 — the mechanism is α-independent). */
  val MixAlpha = 0.5

  /** Temperature-based language-mixture weights — the corpus-mix
    * rebalance multilingual training runs use (mT5/XLM-R style): sample
    * language l with probability ∝ p_l^α where p_l is its natural share,
    * flattening the head and boosting the tail. Output per language:
    * natural share `p`, sampling weight `w = p^α / Σ p^α`, and
    * `boost = w/p` — the up/down-weighting factor a sampler applies
    * (>1 for tail languages, <1 for the head). The fixed-rate
    * [[stratifiedSample]] is the mechanism that CONSUMES such rates;
    * this computes them from the corpus itself.
    *
    * Shape at 100 TB: ONE map-side-combined count per language (≤ langs
    * rows leave the agg); everything after is driver-sized arithmetic —
    * the total and the normalizer join back as broadcast 1-row frames
    * (same shape as tfidf's corpus count). The normalizer Σ√p routes
    * through the exact DECIMAL accumulator (graft.Exact.dsum) so the
    * 5-term sum is order-independent — bit-identical across engines AND
    * across cluster partition orders. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // deferred checkpoint: the langs-row counts frame feeds THREE plan
    // consumers (total, normalizer, output spine) — without it each
    // crossJoin consumer re-runs the corpus count scan (the audit
    // showed 4 FileScans for what is one count pass; same reasoning as
    // Dedup.sharedSigSets, but per-call since the frame is ≤ langs rows)
    val counts = Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(eager = false)
    val tot = counts.agg(sum($"n_docs").as("N"))
    val base = counts.crossJoin(broadcast(tot))
      .withColumn("p", $"n_docs".cast("double") / $"N".cast("double"))
      .withColumn("sq", sqrt($"p"))
    val den = base.agg(graft.Exact.dsum($"sq").as("denom"))
    base.crossJoin(broadcast(den))
      .select($"lang", $"n_docs", $"p",
        ($"sq" / $"denom").as("w"),
        (($"sq" / $"denom") / $"p").as("boost"))
      .orderBy($"lang")
  }

  /** Oracle: same chain; the VARCHAR route in the DECIMAL sum mirrors
    * Spark's shortest-repr double→decimal cast (see Relational.q1AggSql). */
  /** The mix query body WITHOUT its final ORDER BY — shared verbatim by
    * [[temperatureMixSql]] (which appends the ordering) and
    * [[temperatureSampleSql]] (which embeds it as a CTE, where an inner
    * ORDER BY would be illegal). One constant instead of a string-strip
    * so an edit to the mix SQL cannot silently desynchronize the two
    * (ADVICE r7). */
  private val temperatureMixBodySql: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS N FROM counts),
      |base AS (SELECT lang, n_docs,
      |    CAST(n_docs AS DOUBLE) / CAST(N AS DOUBLE) AS p,
      |    sqrt(CAST(n_docs AS DOUBLE) / CAST(N AS DOUBLE)) AS sq
      |  FROM counts CROSS JOIN tot),
      |den AS (SELECT CAST(CAST(SUM(CAST(CAST(sq AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS denom
      |        FROM base)
      |SELECT lang, n_docs, p, sq / denom AS w, (sq / denom) / p AS boost
      |FROM base CROSS JOIN den""".stripMargin

  val temperatureMixSql: String =
    temperatureMixBodySql + "\nORDER BY lang"

  /** APPLY [[temperatureMix]]'s computed weights as a deterministic
    * subsample — the step that closes the corpus-mix loop (the mix
    * query computes target weights; until now only the FIXED-rate
    * [[stratifiedSample]] consumed rates). Per-language keep rate
    * r_l = boost_l / max_l boost_l: the most up-weighted (tail)
    * language keeps every doc — subsampling cannot up-weight — and
    * every other language is thinned so the KEPT corpus composition is
    * ∝ w_l exactly in expectation (kept_l ≈ n_l·r_l ∝ n_l·w_l/p_l =
    * N·w_l). Membership is the hash-bucket trick of [[datasetSplit]]
    * on a fresh salt, but CONTINUOUS: a 60-bit md5 fraction in [0,1)
    * compared to the data-derived rate (both engines compute the same
    * IEEE doubles — rates inherit temperature_mix's bit-identical
    * boosts, the fraction is an exact integer→double conversion — so
    * the keep SET is identical, not just statistically equal).
    *
    * Shape at 100 TB: the mix is one map-side-combined count per
    * language; rates broadcast (langs rows); membership is a narrow
    * codegen'd projection + filter — no shuffle of the corpus, no
    * stored sample table, re-derivable anywhere like every sampling
    * predicate here. */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // same two-consumer story one level up: the mix frame feeds the max
    // aggregate AND the rates projection
    val mix = temperatureMix(spark, dir).localCheckpoint(eager = false)
    val mx = mix.agg(max($"boost").as("mb"))
    val rates = mix.crossJoin(broadcast(mx))
      .select($"lang", ($"boost" / $"mb").as("rate"))
    val frac =
      conv(substring(md5(concat(lit("tsample:"), $"doc_id".cast("string"))), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(TSampleDenom)
    Tables.documentsPar(spark, dir)
      .join(broadcast(rates), Seq("lang"))
      .select($"doc_id", $"lang", $"rate", frac.as("frac"))
      .filter($"frac" < $"rate")
      .select($"doc_id", $"lang", $"rate")
      .orderBy($"doc_id")
  }

  /** 2^60 — the 15-hex-char hash fraction's denominator. */
  private val TSampleDenom: Double = 1152921504606846976.0

  val temperatureSampleSql: String = {
    val mix = temperatureMixBodySql
    s"""WITH mix AS ($mix),
       |rates AS (SELECT lang, boost / (SELECT MAX(boost) FROM mix) AS rate
       |          FROM mix)
       |SELECT d.doc_id, d.lang, r.rate
       |FROM documents d JOIN rates r ON d.lang = r.lang
       |WHERE CAST(('0x' || substr(md5('tsample:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
       |        / $TSampleDenom < r.rate
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The packing query WITHOUT its final sort (the window's own
    * "ORDER BY doc_id" — the running-sum ordering — is internal and
    * stays). Shared verbatim by [[packShardsSql]], [[shardManifestSql]]
    * and [[epochOrderSql]] — one constant, no string-stripping (the
    * temperatureMixBodySql convention, ADVICE r7). */
  private val packShardsBodySql: String =
    // CAST: DuckDB's window SUM over BIGINT yields HUGEINT, and `//` of a
    // HUGEINT stays HUGEINT, which the driver's dump widens to DOUBLE —
    // hash-mismatching Spark's BIGINT floor() despite identical values.
    s"""SELECT doc_id, lang, n_tokens,
       |  CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard_id
       |FROM (SELECT doc_id, lang, n_tokens,
       |        SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM (SELECT doc_id, lang,
       |              len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tokens
       |            FROM documents))""".stripMargin

  val packShardsSql: String =
    packShardsBodySql + "\nORDER BY doc_id"

  /** Context-window chunking: tokens per chunk / stride (stride <
    * ChunkTokens ⇒ 16-token overlap, the standard trick so no span is
    * ever split across a boundary without also appearing whole). */
  val ChunkTokens = 64
  val ChunkStride = 48

  /** Document chunking for a fixed context window: each doc explodes
    * into overlapping token windows of [[ChunkTokens]], starting every
    * [[ChunkStride]] tokens — the step between curated docs and
    * fixed-length training sequences.
    *
    * Shape at 100 TB: the start offsets come from `sequence()` +
    * `explode` (pure narrow, no shuffle — chunking is embarrassingly
    * parallel), and each chunk's text is a `slice` + `array_join`
    * projection of the doc's own token array, all codegen'd. Output
    * rows carry chunk text, so this is the one op whose OUTPUT is
    * corpus-sized × overlap-factor — downstream consumers should write
    * it straight to storage, never shuffle it. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    chunksOf(Tables.documentsPar(spark, dir)).orderBy("doc_id", "chunk_id")

  /** The chunk frame over an arbitrary documents frame — shared by
    * [[chunkDocs]] and [[graft.ops.Search.passageSearch]] (passage-
    * level retrieval scores exactly the chunks the training pipeline
    * packs, one definition of "passage"). */
  private[graft] def chunksOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val t = TextAnalysis.toks($"text") // the shared corpus tokenization
    docs
      .select($"doc_id", t.as("toks"))
      .select($"doc_id", $"toks",
        explode(sequence(lit(1), greatest(size($"toks"), lit(1)),
          lit(ChunkStride))).as("start"))
      .withColumn("chunk", slice($"toks", $"start", lit(ChunkTokens)))
      .select($"doc_id",
        floor(($"start" - 1) / ChunkStride).cast("long").as("chunk_id"),
        array_join($"chunk", " ").as("chunk_text"),
        size($"chunk").as("n_chunk_tokens"))
  }

  val chunkDocsSql: String =
    s"""SELECT doc_id,
       |  CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
       |  array_to_string(toks[start:start + ${ChunkTokens - 1}], ' ') AS chunk_text,
       |  len(toks[start:start + ${ChunkTokens - 1}]) AS n_chunk_tokens
       |FROM (SELECT doc_id, toks,
       |        UNNEST(range(1, greatest(len(toks), 1) + 1, $ChunkStride)) AS start
       |      FROM (SELECT doc_id,
       |              string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |            FROM documents))
       |ORDER BY doc_id, chunk_id""".stripMargin

  // declared after packShardsBodySql: object vals initialize in source order
  val shardManifestSql: String =
    s"""SELECT lang, shard_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM ($packShardsBodySql)
       |GROUP BY lang, shard_id
       |ORDER BY lang, shard_id""".stripMargin

  /** Epochs emitted by [[epochOrder]]. */
  val NEpochs = 2

  /** Deterministic training-order shuffle — the data-loader step after
    * packing: for each epoch, permute the SHARD serving order and the
    * document order WITHIN each shard, both by salted hash (the
    * two-level shuffle every large-scale loader ships — a true global
    * permutation would be one all-data sort per epoch; shard-major +
    * intra-shard is the standard approximation, cf. Megatron-LM's
    * data loader, arXiv:1909.08053). Hash-keyed like
    * [[datasetSplit]]: any engine recomputes the same epoch order, no
    * stored permutation table.
    *
    * Shape at 100 TB: the ×[[NEpochs]] expansion is a broadcast cross
    * join (map-side, never shuffled alone); the within-shard
    * row_number window partitions by (epoch, lang, shard) — shard
    * size is budget-bounded, so no window partition exceeds ~budget
    * tokens of docs; the shard permutation is computed at MANIFEST
    * grain (distinct shards × epochs) and broadcast back. One shuffle
    * of (id, lang, shard, epoch) rows total — text never moves. */
  def epochOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val packed = packedOf(spark, dir)
    val epochs = spark.range(1, NEpochs + 1)
      .select($"id".cast("int").as("epoch"))
    val expanded = packed.crossJoin(broadcast(epochs))
    val docKey = md5(concat(lit("ep:"), $"epoch".cast("string"),
      lit(":"), $"doc_id".cast("string")))
    val shardKey = md5(concat(lit("shard:"), $"epoch".cast("string"),
      lit(":"), $"lang", lit(":"), $"shard_id".cast("string")))
    val shardPos = packed.select($"lang", $"shard_id").distinct()
      .crossJoin(broadcast(epochs))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy($"epoch").orderBy(shardKey, $"lang", $"shard_id")))
    val w = Window.partitionBy($"epoch", $"lang", $"shard_id")
      .orderBy(docKey, $"doc_id")
    expanded
      .withColumn("pos", row_number().over(w))
      .join(broadcast(shardPos), Seq("epoch", "lang", "shard_id"))
      .select($"epoch", $"lang", $"shard_id", $"shard_pos", $"doc_id", $"pos")
      .orderBy($"epoch", $"lang", $"shard_id", $"pos")
  }

  val epochOrderSql: String =
    s"""WITH packed AS ($packShardsBodySql),
       |eps AS (SELECT CAST(UNNEST(range(1, ${NEpochs + 1})) AS INTEGER) AS epoch),
       |sp AS (SELECT epoch, lang, shard_id,
       |         ROW_NUMBER() OVER (PARTITION BY epoch
       |           ORDER BY md5('shard:' || CAST(epoch AS VARCHAR) || ':' || lang || ':' || CAST(shard_id AS VARCHAR)),
       |             lang, shard_id) AS shard_pos
       |       FROM (SELECT DISTINCT lang, shard_id FROM packed) CROSS JOIN eps),
       |ordered AS (SELECT epoch, lang, shard_id, doc_id,
       |         ROW_NUMBER() OVER (PARTITION BY epoch, lang, shard_id
       |           ORDER BY md5('ep:' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
       |             doc_id) AS pos
       |       FROM packed CROSS JOIN eps)
       |SELECT epoch, lang, shard_id, shard_pos, doc_id, pos
       |FROM ordered JOIN sp USING (epoch, lang, shard_id)
       |ORDER BY epoch, lang, shard_id, pos""".stripMargin

  // ------------------------------------------------- contrastive pair mining

  /** Similarity bars for [[contrastivePairs]]: >= PosBar is a positive
    * (near-duplicate) pair; < HardNegHi (but still LSH-collided and
    * verified >= the funnel's 0.1 floor) is a HARD negative — lexically
    * confusable, verifiably not a duplicate. */
  val PosBar = 0.3
  val HardNegHi = 0.2

  /** Registered query: contrastive training pairs mined from the dedup
    * funnel — the dataset-construction step for embedding/retriever
    * training (SimCSE/DPR-style: positives from near-duplicate pairs,
    * hard negatives from candidates that COLLIDED in an LSH band and
    * verified similar-but-below-the-bar; random negatives any loader
    * can sample, it is the hard ones that need mining). Pure reuse of
    * the verified-pair table the dedup pipeline already maintains —
    * mining costs one projection over [[Dedup.sharedJaccardPairs]],
    * and at 100 TB it reads the PERSISTED funnel pairs, no corpus
    * scan. Pairs with jaccard in [HardNegHi, PosBar) are ambiguous
    * and emitted as neither. */
  def contrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.sharedJaccardPairs(spark, dir)
      .select($"id_a".as("anchor_id"), $"id_b".as("pair_id"), $"jaccard",
        when($"jaccard" >= PosBar, "positive")
          .when($"jaccard" < HardNegHi, "hard_negative").as("pair_type"))
      .filter($"pair_type".isNotNull)
      .orderBy($"anchor_id", $"pair_id")
  }

  val contrastivePairsSql: String =
    s"""SELECT id_a AS anchor_id, id_b AS pair_id, jaccard,
       |  CASE WHEN jaccard >= $PosBar THEN 'positive'
       |       WHEN jaccard < $HardNegHi THEN 'hard_negative' END AS pair_type
       |FROM (${Dedup.dedupJaccardSql}) p
       |WHERE jaccard >= $PosBar OR jaccard < $HardNegHi
       |ORDER BY anchor_id, pair_id""".stripMargin
}
