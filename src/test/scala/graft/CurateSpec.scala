package graft

import graft.ops.{Curate, Dedup, TextAnalysis}

/** Composition invariants of the end-to-end curation query: every
  * survivor must independently satisfy each stage it claims to compose. */
class CurateSpec extends SparkSpec {

  test("corpus_curate survivors satisfy every stage independently") {
    import spark.implicits._
    val survivors = Curate.corpusCurate(spark, sfDir)
    assert(survivors.count() > 0, "curation filtered everything — thresholds drifted")

    // stage 1+2: every survivor clears the language and quality bars
    assert(survivors.filter($"pred_lang" === "und").count() == 0)
    assert(survivors.filter($"quality_score" < Curate.QualityBar).count() == 0)

    // stage 3: survivors are exact-dedup keepers
    val keepers = Dedup.dedupExact(spark, sfDir).select($"keep_id".as("doc_id"))
    assert(survivors.select("doc_id").join(keepers, Seq("doc_id"), "left_anti").count() == 0)

    // stage 4: no survivor is a non-representative member of a near-dup
    // cluster (cluster_id < doc_id means a smaller twin survived instead)
    val losers = Dedup.clustersOf(
      Dedup.dedupJaccardOf(Tables.documentsPar(spark, sfDir))
        .select($"id_a", $"id_b"))
      .filter($"cluster_id" =!= $"doc_id").select($"doc_id")
    assert(survivors.select("doc_id").join(losers, Seq("doc_id"), "left_semi").count() == 0)

    // and the stages agree with the standalone queries' values
    val standalone = TextAnalysis.textQuality(spark, sfDir)
      .select($"doc_id", $"quality_score".as("q2"))
    val joined = survivors.join(standalone, "doc_id")
    assert(joined.filter($"quality_score" =!= $"q2").count() == 0,
      "composed quality_score diverges from text_quality")
  }

  test("adaptive_quality cuts each language at its own histogram quantile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Curate.adaptiveQuality(spark, sfDir)
    // total: one verdict per document
    assert(out.count() == Tables.documents(spark, sfDir).count())
    // the keep flag is exactly the bin-vs-bar comparison
    assert(out.filter($"keep" =!= ($"bin" >= $"bar_bin")).count() == 0)
    // bins agree with the standalone quality scoring
    val rescored = TextAnalysis.textQuality(spark, sfDir)
      .select($"doc_id", floor($"quality_score" * 20).as("bin2"))
    assert(out.join(rescored, "doc_id").filter($"bin" =!= $"bin2").count() == 0)
    // per language, the dropped fraction stays strictly below the target
    // (the bar bin is the FIRST bin whose cumulative count reaches it)
    val perLang = out.groupBy($"lang").agg(
      count(lit(1)).as("tot"),
      sum(when(!$"keep", 1L).otherwise(0L)).as("dropped")).collect()
    perLang.foreach { r =>
      val frac = r.getAs[Long]("dropped").toDouble / r.getAs[Long]("tot")
      assert(frac < Curate.AdaptiveDropFraction,
        s"${r.getAs[String]("lang")}: dropped $frac >= ${Curate.AdaptiveDropFraction}")
    }
    // the bar is per-language state: one bar bin per language
    assert(out.select($"lang", $"bar_bin").distinct().count() ==
      out.select($"lang").distinct().count())
  }

  test("cluster_canonical picks each cluster's best-quality member") {
    import spark.implicits._
    val canon = Curate.clusterCanonical(spark, sfDir)
    val clusters = Dedup.dedupClusters(spark, sfDir)
    // one canonical per cluster, and it IS a member of that cluster
    assert(canon.select("cluster_id").distinct().count() == canon.count())
    assert(canon.count() == clusters.select("cluster_id").distinct().count())
    assert(canon.select($"canon_id".as("doc_id"), $"cluster_id")
      .except(clusters).count() == 0)
    // n_members matches the cluster table's cardinality
    val sizes = clusters.groupBy($"cluster_id").count()
    assert(canon.join(sizes, "cluster_id")
      .filter($"n_members" =!= $"count").count() == 0)
    // no member of the cluster outscores its canonical (ties break to
    // the smaller doc_id)
    val scored = TextAnalysis.textQuality(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val better = clusters.join(scored, "doc_id")
      .join(canon.select($"cluster_id", $"canon_id", $"canon_quality"), "cluster_id")
      .filter($"quality_score" > $"canon_quality" ||
        ($"quality_score" === $"canon_quality" && $"doc_id" < $"canon_id"))
    assert(better.count() == 0, "a cluster member outscores its canonical")
  }

  test("source_cap keeps at most K docs per source, deterministically") {
    import spark.implicits._
    val capped = Curate.sourceCap(spark, sfDir)
    val perSource = capped.groupBy($"source").count().collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getAs[Long]("count") <= Curate.SourceCapK))
    // the fixture's 25-docs-per-source layout means the cap BINDS
    assert(perSource.forall(_.getAs[Long]("count") == Curate.SourceCapK),
      "cap should bind on every fixture source")
    // hash order is deterministic: two plans, identical selection
    val a = capped.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Curate.sourceCap(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("source_cap pushes a partial rank limit below the source exchange") {
    val plan = Curate.sourceCap(spark, sfDir)
      .queryExecution.executedPlan.toString
    // WindowGroupLimit Partial = every map task keeps <= K rows per
    // source BEFORE the shuffle — a 10-billion-doc source moves
    // K * tasks rows, not 10 billion (same shape as ann_batch_topk)
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"plan was:\n$plan")
  }
}
