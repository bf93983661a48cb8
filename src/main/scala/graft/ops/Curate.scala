package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the flagship COMPOSITION of the
  * LLM-pipeline operators (the point of a library over one-off jobs):
  * a document survives iff it is
  *   1. the exact-dedup keeper for its normalized text (Dedup.dedupExact),
  *   2. its near-dup cluster representative — or unclustered
  *      (Dedup.clustersOf over the LSH→jaccard funnel),
  *   3. identifiable-language (predLangExpr != 'und'), and
  *   4. above the quality bar (qualityScoreExpr >= 0.45, which splits
  *      the fixture's 0.31–0.57 score range).
  *
  * Execution shape at 100 TB: one scored narrow projection over the
  * corpus, one semi join against the (small) keeper-id set, one anti
  * join against the (smaller) cluster-loser set — both build sides are
  * id-only frames that AQE broadcasts when they fit. Every stage is the
  * already-verified operator; this query pins that they compose without
  * re-shuffling the text.
  */
object Curate {

  /** Quality threshold: splits the fixture's score range (min 0.31,
    * max 0.57) so the filter is exercised in both directions. */
  val QualityBar = 0.45

  def corpusCurate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsPar(spark, dir)
    // plan barrier on the scored frame: the output EMITS
    // pred_lang/quality_score, so without it the pushed-down gate
    // predicate re-evaluates the full scorer expression per doc beside
    // the projection's copy — measured 2× the stopword regex pass
    // (plans/r17/corpus_curate_before.txt: the same 56-regexp tree in
    // Filter(2) AND Project(4)); exec 2.6 → 0.7 s at sf0.1
    val scored = Tables.planBarrier(docs.select($"doc_id",
      TextAnalysis.predLangExpr($"text").as("pred_lang"),
      TextAnalysis.qualityScoreExpr($"text").as("quality_score")))
    val keepers = Dedup.dedupExact(spark, dir).select($"keep_id".as("doc_id"))
    // sharedClusters: reuses the session-shared funnel + cluster-label
    // materializations instead of rebuilding them from text (see Dedup)
    val losers = Dedup.sharedClusters(spark, dir)
      .filter($"cluster_id" =!= $"doc_id").select($"doc_id")
    scored
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
      .filter($"pred_lang" =!= "und" && $"quality_score" >= QualityBar)
      .orderBy($"doc_id")
  }

  /** Quality-aware canonical selection: per duplicate cluster, keep the
    * member with the HIGHEST quality score (ties → smallest doc_id) —
    * what production dedup actually does, rather than min-id keeping
    * (min-id is the CLUSTER LABEL convention; the kept TEXT should be
    * the best copy: near-dups differ by boilerplate, truncation,
    * OCR noise).
    *
    * Shape at 100 TB: the cluster table is broadcast (post-funnel,
    * tiny), quality scores are computed only on cluster MEMBERS (the
    * join runs before the scoring projection), and the argmax is one
    * ranking window hash-partitioned by cluster id. */
  def clusterCanonical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val members = Dedup.sharedClusters(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"quality_score".desc, $"doc_id")
    val wc = org.apache.spark.sql.expressions.Window.partitionBy($"cluster_id")
    Tables.documentsPar(spark, dir)
      .join(broadcast(members), "doc_id")
      .select($"doc_id", $"cluster_id",
        TextAnalysis.qualityScoreExpr($"text").as("quality_score"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wc))
      .filter($"rk" === 1)
      .select($"cluster_id", $"doc_id".as("canon_id"), $"n_members",
        $"quality_score".as("canon_quality"))
      .orderBy($"cluster_id")
  }

  /** Oracle: clusters via the recursive closure, quality via the
    * verified text_quality SQL, argmax via QUALIFY (windows evaluate
    * before QUALIFY filters, so n_members counts ALL members — the same
    * order Spark's filter-after-window takes). */
  val clusterCanonicalSql: String = {
    val jacc = Dedup.dedupJaccardSql.replace("ORDER BY id_a, id_b", "")
    val qual = TextAnalysis.textQualitySql.replace("ORDER BY doc_id", "")
    s"""WITH RECURSIVE ${Dedup.clustersSqlCtes(jacc)},
       |q AS (SELECT doc_id, quality_score FROM ($qual)),
       |m AS (SELECT c.cluster_id, c.doc_id, q.quality_score
       |      FROM clusters c JOIN q USING (doc_id))
       |SELECT cluster_id, doc_id AS canon_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
       |  quality_score AS canon_quality
       |FROM m
       |QUALIFY row_number() OVER (PARTITION BY cluster_id
       |  ORDER BY quality_score DESC, doc_id) = 1
       |ORDER BY cluster_id""".stripMargin
  }

  /** Fraction of each language's documents the adaptive bar aims to drop
    * ([[adaptiveQuality]]): the bar bin is the lowest histogram bin whose
    * cumulative count reaches this fraction. */
  val AdaptiveDropFraction = 0.25

  /** Adaptive per-language quality bar — the production form of the
    * fixed [[QualityBar]]: a single global threshold over-prunes
    * languages whose score distribution sits low (stopword lists and
    * length norms differ by language), so real pipelines cut each
    * language at its own quantile. The quantile is computed from the
    * 0.05-wide histogram ([[TextAnalysis.qualityHistogram]]'s binning),
    * NOT an exact percentile: per-language aggregation state is a
    * ≤20-counter histogram instead of every score (exact percentile
    * buffers all values per group — unbounded at 100 TB), the bar is
    * integer logic over exact counts (bit-identical cross-engine where
    * sketch-based approx_percentile could never oracle-match), and bin
    * granularity is exactly what a human-audited threshold uses anyway.
    *
    * Shape at 100 TB: one narrow scored projection (codegen'd), one
    * map-side-combined (lang, bin) count (≤ langs×20 rows), a ~100-row
    * window pass on the driver-sized histogram, and a broadcast join of
    * the per-language bar back to the scored rows. Nothing wide ever
    * shuffles. */
  def adaptiveQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // both consumers (histogram + output join) share ONE scan-and-score
    // pass: without the checkpoint each branch re-reads and re-scores the
    // full corpus text (the scored rows are ~20 bytes/doc; the text is not)
    val scored = Tables.documentsPar(spark, dir).select(
      $"doc_id", $"lang",
      floor(TextAnalysis.qualityScoreExpr($"text") * 20).as("bin"))
      .localCheckpoint(eager = false)
    val hist = scored.groupBy($"lang", $"bin").agg(count(lit(1)).as("n"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"bin")
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    val bar = hist
      .withColumn("cumn", sum($"n").over(wCum))
      .withColumn("tot", sum($"n").over(wTot))
      .filter($"cumn".cast("double") >= lit(AdaptiveDropFraction) * $"tot".cast("double"))
      .groupBy($"lang").agg(min($"bin").as("bar_bin"))
    scored.join(broadcast(bar), "lang")
      .select($"doc_id", $"lang", $"bin", $"bar_bin",
        ($"bin" >= $"bar_bin").as("keep"))
      .orderBy($"doc_id")
  }

  val adaptiveQualitySql: String = {
    val qual = TextAnalysis.textQualitySql.replace("ORDER BY doc_id", "")
    s"""WITH scored AS (
       |  SELECT q.doc_id, d.lang, CAST(floor(q.quality_score * 20) AS BIGINT) AS bin
       |  FROM ($qual) q JOIN documents d ON q.doc_id = d.doc_id),
       |hist AS (SELECT lang, bin, COUNT(*) AS n FROM scored GROUP BY lang, bin),
       |cum AS (SELECT lang, bin,
       |          SUM(n) OVER (PARTITION BY lang ORDER BY bin) AS cumn,
       |          SUM(n) OVER (PARTITION BY lang) AS tot
       |        FROM hist),
       |bar AS (SELECT lang, MIN(bin) AS bar_bin FROM cum
       |        WHERE CAST(cumn AS DOUBLE) >= $AdaptiveDropFraction * CAST(tot AS DOUBLE)
       |        GROUP BY lang)
       |SELECT s.doc_id, s.lang, s.bin, b.bar_bin, s.bin >= b.bar_bin AS keep
       |FROM scored s JOIN bar b USING (lang)
       |ORDER BY s.doc_id""".stripMargin
  }

  /** FULL-PIPELINE composition — raw documents to training shards in ONE
    * declarative plan, pinning that BOTH sides compose end to end (the
    * id-side stages corpus_curate pins and the text-side stages
    * curate_text pins, chained in production order):
    *
    *   1. quality/language gates on the raw text (cheapest first: score
    *      everything, prune before any heavier stage touches the text),
    *   2. exact-dedup keepers (semi join) and near-dup cluster losers
    *      (anti join) — dedup runs BEFORE splitting, the stage order
    *      whose inversion is the classic production leakage bug (a near
    *      dup pair split across train/test survives any later audit),
    *   3. clean → PII-scrub on the SURVIVORS only (redaction counts see
    *      the cleaned text; token counts see the curated text), with the
    *      curate_text keep bars applied,
    *   4. deterministic hash split (a predicate of doc_id — no split
    *      table, stable under growth),
    *   5. shard packing per (lang, split) with token counts from the
    *      CURATED text — shards are budgeted on what the trainer will
    *      actually read, not the raw bytes.
    *
    * Shape at 100 TB: one narrow scored scan, two id-only broadcast-able
    * joins, chained codegen'd regex projections, one running-sum window
    * hash-partitioned by (lang, split). The whole chain is ONE Spark job
    * (verified in PLANS.md): nothing materializes between stages, no
    * text ever shuffles except the final window's survivors (post-gate,
    * post-dedup — a small fraction of the corpus). */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 1. gates on raw text — plan barrier between the scorer projection
    //    and its gate (the corpusCurate finding: the output emits the
    //    scorer columns, so the pushed gate predicate would re-run the
    //    whole scorer per doc)
    val gated = Tables.planBarrier(Tables.documentsPar(spark, dir)
      .select($"doc_id", $"lang", $"text",
        TextAnalysis.predLangExpr($"text").as("pred_lang"),
        TextAnalysis.qualityScoreExpr($"text").as("quality_score")))
      .filter($"pred_lang" =!= "und" && $"quality_score" >= QualityBar)
    // 2. dedup keepers (computed over the FULL corpus — gating must not
    //    change which copy of a duplicate family is canonical)
    val keepers = Dedup.dedupExact(spark, dir).select($"keep_id".as("doc_id"))
    val losers = Dedup.sharedClusters(spark, dir)
      .filter($"cluster_id" =!= $"doc_id").select($"doc_id")
    val deduped = gated
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
    // 3. text transforms on survivors only + curate keep bars
    val cleaned = TextAnalysis.cleanExpr($"text")
    // the same barrier between the clean→scrub chain and its keep bars:
    // n_redacted/n_tokens derive from the chain AND curated is emitted,
    // so the pushed bars would re-run clean+scrub per doc
    val curated = Tables.planBarrier(deduped
      .withColumn("curated", TextAnalysis.scrubExpr(cleaned))
      .withColumn("n_redacted",
        size(regexp_extract_all(cleaned, lit(TextAnalysis.EmailPattern), lit(0))) +
          size(regexp_extract_all(cleaned, lit(TextAnalysis.UrlPattern), lit(0))))
      .withColumn("n_tokens", size(TextAnalysis.toks($"curated")).cast("long"))
      .drop("text"))
      .filter($"n_redacted" <= TextAnalysis.CurateMaxRedactions &&
        $"n_tokens" >= TextAnalysis.CurateMinTokens)
    // 4 + 5. split predicate, then pack shards within (lang, split)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"split").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    curated
      .withColumn("split", TrainPrep.splitExpr($"doc_id"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"lang", $"pred_lang", $"quality_score", $"split",
        $"n_tokens",
        floor(($"cum" - $"n_tokens") / TrainPrep.ShardTokenBudget).as("shard_id"),
        $"curated")
      .orderBy($"doc_id")
  }

  /** Oracle: the same chain recomposed from the per-stage verified SQL
    * (closure CTEs for clusters, langId/textQuality expressions for the
    * gates, cleanSqlExpr + the PII patterns for the transforms, the
    * splitLeakage hash CASE for the split, packShards' window for the
    * packing). */
  val pipelineE2eSql: String = {
    val jacc = Dedup.dedupJaccardSql.replace("ORDER BY id_a, id_b", "")
    val lang = TextAnalysis.langIdSql.replace("ORDER BY doc_id", "")
    val qual = TextAnalysis.textQualitySql.replace("ORDER BY doc_id", "")
    val email = TextAnalysis.EmailPattern
    val url = TextAnalysis.UrlPattern
    val splitB = "('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"
    s"""WITH RECURSIVE ${Dedup.clustersSqlCtes(jacc)},
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
       |losers AS (SELECT doc_id FROM clusters WHERE cluster_id != doc_id),
       |gated AS (
       |  SELECT d.doc_id, d.lang, d.text, l.pred_lang, q.quality_score
       |  FROM documents d
       |  JOIN ($lang) l ON d.doc_id = l.doc_id
       |  JOIN ($qual) q ON d.doc_id = q.doc_id
       |  WHERE l.pred_lang != 'und' AND q.quality_score >= $QualityBar),
       |deduped AS (
       |  SELECT g.* FROM gated g
       |  JOIN keepers k ON g.doc_id = k.doc_id
       |  WHERE g.doc_id NOT IN (SELECT doc_id FROM losers)),
       |curated0 AS (
       |  SELECT doc_id, lang, pred_lang, quality_score,
       |    ${TextAnalysis.cleanSqlExpr("text")} AS cleaned
       |  FROM deduped),
       |curated AS (
       |  SELECT doc_id, lang, pred_lang, quality_score,
       |    regexp_replace(regexp_replace(cleaned, '$url', '<URL>', 'g'),
       |                   '$email', '<EMAIL>', 'g') AS curated,
       |    len(regexp_extract_all(cleaned, '$email'))
       |      + len(regexp_extract_all(cleaned, '$url')) AS n_redacted,
       |    len(string_split(regexp_replace(lower(trim(
       |      regexp_replace(regexp_replace(cleaned, '$url', '<URL>', 'g'),
       |                     '$email', '<EMAIL>', 'g'))), '\\s+', ' ', 'g'), ' ')) AS n_tokens
       |  FROM curated0),
       |kept AS (
       |  SELECT * FROM curated
       |  WHERE n_redacted <= ${TextAnalysis.CurateMaxRedactions}
       |    AND n_tokens >= ${TextAnalysis.CurateMinTokens}),
       |labeled AS (
       |  SELECT *,
       |    CASE WHEN $splitB < 80 THEN 'train'
       |         WHEN $splitB < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM kept),
       |packed AS (
       |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang, split ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM labeled)
       |SELECT doc_id, lang, pred_lang, quality_score, split, n_tokens,
       |  CAST((cum - n_tokens) // ${TrainPrep.ShardTokenBudget} AS BIGINT) AS shard_id,
       |  curated
       |FROM packed
       |ORDER BY doc_id""".stripMargin
  }

  /** Corpus-version diff — the snapshot-compare audit run whenever a
    * corpus is refreshed (new crawl, license takedowns, re-scrape):
    * which CONTENT was added, removed, or kept between two versions,
    * keyed by the normalized-text digest (Dedup.dedupExact's key), so
    * renames/re-crawls of identical text don't read as churn. The
    * fixture stand-in slices two overlapping versions from doc_id
    * ranges (old = id < 400, new = id ≥ 100 — an SF-independent
    * windowed refresh); production passes two corpus paths.
    *
    * Shape at 100 TB: one digest aggregate per version (map-side
    * combined, digests+ids only — text never leaves the scan) and one
    * full-outer join ON the digest — the shuffle carries 16-byte
    * digests, and content-addressed storage would bucket both sides by
    * digest making it exchange-free. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documentsPar(spark, dir)
    def keepers(pred: org.apache.spark.sql.Column, as: String) =
      docs.filter(pred)
        .select(md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("digest"),
          $"doc_id")
        .groupBy($"digest").agg(min($"doc_id").as(as))
    keepers($"doc_id" < 400, "old_id")
      .join(keepers($"doc_id" >= 100, "new_id"), Seq("digest"), "full_outer")
      .withColumn("status",
        when($"new_id".isNull, "removed")
          .when($"old_id".isNull, "added")
          .otherwise("kept"))
      .orderBy($"digest")
  }

  val corpusDiffSql: String =
    """WITH o AS (
      |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS digest,
      |         MIN(doc_id) AS old_id
      |  FROM documents WHERE doc_id < 400 GROUP BY 1),
      |n AS (
      |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS digest,
      |         MIN(doc_id) AS new_id
      |  FROM documents WHERE doc_id >= 100 GROUP BY 1)
      |SELECT COALESCE(o.digest, n.digest) AS digest, o.old_id, n.new_id,
      |  CASE WHEN n.new_id IS NULL THEN 'removed'
      |       WHEN o.old_id IS NULL THEN 'added'
      |       ELSE 'kept' END AS status
      |FROM o FULL OUTER JOIN n ON o.digest = n.digest
      |ORDER BY digest""".stripMargin

  /** Cross-split contamination audit: near-duplicate pairs whose members
    * land in DIFFERENT train/val/test splits — the leakage check every
    * eval-honest pipeline runs after splitting (a test doc that near-dups
    * a train doc inflates eval scores exactly like decontamination
    * misses do).
    *
    * Shape at 100 TB: the split is a hash PREDICATE of the id
    * (TrainPrep.splitExpr), so both sides are labeled with two narrow
    * projections over the already-materialized pair table — zero joins,
    * zero extra shuffles; the naive form (join the pair table against a
    * split table twice) would shuffle the pair table twice for
    * information its own id columns already carry. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.sharedJaccardPairs(spark, dir)
      .select($"id_a", $"id_b", $"jaccard",
        TrainPrep.splitExpr($"id_a").as("split_a"),
        TrainPrep.splitExpr($"id_b").as("split_b"))
      .filter($"split_a" =!= $"split_b")
      .orderBy($"id_a", $"id_b")
  }

  val splitLeakageSql: String = {
    val jacc = Dedup.dedupJaccardSql.replace("ORDER BY id_a, id_b", "")
    def sp(c: String) = {
      val b = s"('0x' || substr(md5('split:' || CAST($c AS VARCHAR)), 1, 15))::BIGINT % 100"
      s"CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END"
    }
    s"""SELECT * FROM (
       |  SELECT id_a, id_b, jaccard,
       |    ${sp("id_a")} AS split_a,
       |    ${sp("id_b")} AS split_b
       |  FROM ($jacc))
       |WHERE split_a <> split_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle: the same composition assembled from the already-verified
    * per-stage SQL (clusters via the recursive-CTE closure). The score
    * threshold cut is engine-stable because quality_score is
    * bit-identical in both engines (see TextAnalysis). */
  val corpusCurateSql: String = {
    val jacc = Dedup.dedupJaccardSql.replace("ORDER BY id_a, id_b", "")
    val lang = TextAnalysis.langIdSql.replace("ORDER BY doc_id", "")
    val qual = TextAnalysis.textQualitySql.replace("ORDER BY doc_id", "")
    s"""WITH RECURSIVE ${Dedup.clustersSqlCtes(jacc)},
       |losers AS (SELECT doc_id FROM clusters WHERE cluster_id != doc_id),
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
       |scored AS (
       |  SELECT l.doc_id, l.pred_lang, q.quality_score
       |  FROM ($lang) l JOIN ($qual) q ON l.doc_id = q.doc_id)
       |SELECT s.doc_id, s.pred_lang, s.quality_score
       |FROM scored s
       |JOIN keepers k ON s.doc_id = k.doc_id
       |WHERE s.doc_id NOT IN (SELECT doc_id FROM losers)
       |  AND s.pred_lang != 'und' AND s.quality_score >= $QualityBar
       |ORDER BY s.doc_id""".stripMargin
  }

  /** Max documents kept per source by [[sourceCap]]. Fixture sources
    * hold 25 docs each, so 10 binds on every source. */
  val SourceCapK = 10

  /** Per-source contribution cap — the corpus-mix balancing step that
    * keeps any single domain from dominating the training mix (the
    * classic failure: one boilerplate-heavy crawl host contributing 30%
    * of tokens). Keeps at most [[SourceCapK]] docs per source, selected
    * by DETERMINISTIC HASH order (md5 of doc_id) rather than head-of-
    * scan order: a hash-ordered prefix is a uniform random sample of
    * the source, reproducible across runs/engines, where "first K
    * scanned" would bias toward whatever the file layout put first.
    *
    * Shape at 100 TB: one ranking window hash-partitioned by source.
    * The `rk <= K` filter over row_number is the pattern Spark's
    * InferWindowGroupLimit rewrites into a pre-shuffle partial top-k
    * (WindowGroupLimit Partial, pinned in CurateSpec): every map task
    * keeps at most K rows per source BEFORE the exchange, so a
    * 10-billion-doc source shuffles K·tasks rows, not 10 billion —
    * the same physical shape as the batched ANN top-k. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documentsPar(spark, dir)
      .select($"doc_id", $"source", $"lang")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= SourceCapK)
      .orderBy($"source", $"rk")
  }

  val sourceCapSql: String =
    s"""SELECT doc_id, source, lang, rk
       |FROM (SELECT doc_id, source, lang,
       |        row_number() OVER (PARTITION BY source
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |      FROM documents)
       |WHERE rk <= $SourceCapK
       |ORDER BY source, rk""".stripMargin
}
