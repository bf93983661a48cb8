package graft

import graft.ops.{Curate, Dedup, Similarity, TextAnalysis, TrainPrep}
import org.apache.spark.sql.functions._

/** Invariants of the training-prep and corpus-profiling operators that
  * the row/hash oracle can't express: conservation (nothing lost or
  * double-counted between a table and its summary), coverage (chunking
  * spans every token), and cross-operator consistency (the audit
  * queries agree with the tables they audit). */
class TrainPrepSpec extends SparkSpec {

  test("shard_manifest conserves pack_shards exactly") {
    import spark.implicits._
    val packed = TrainPrep.packShards(spark, sfDir)
    val manifest = TrainPrep.shardManifest(spark, sfDir)
    // every (lang, shard) group appears once, doc and token totals agree
    assert(manifest.count() ==
      packed.select($"lang", $"shard_id").distinct().count())
    val regrouped = packed.groupBy($"lang", $"shard_id")
      .agg(count(lit(1)).as("d"), sum($"n_tokens").as("t"))
    assert(manifest.join(regrouped, Seq("lang", "shard_id"))
      .filter($"n_docs" =!= $"d" || $"shard_tokens" =!= $"t").count() == 0)
    // every shard except each language's last holds > budget − maxDoc
    // tokens (greedy packing: a shard's start can overshoot its 5000k
    // boundary by at most the tokens of the doc that crossed it, and its
    // end reaches the next boundary whenever a later shard exists)
    val maxDoc = packed.agg(max($"n_tokens")).head().getLong(0)
    val lastShard = manifest.groupBy($"lang").agg(max($"shard_id").as("last"))
    val under = manifest.join(lastShard, "lang")
      .filter($"shard_id" =!= $"last" &&
        $"shard_tokens" <= TrainPrep.ShardTokenBudget - maxDoc)
    assert(under.count() == 0, "a non-final shard came in under budget − maxDoc")
  }

  test("epoch_order: contiguous positions, full coverage, epochs differ, deterministic") {
    import spark.implicits._
    val eo = TrainPrep.epochOrder(spark, sfDir)
    val packed = TrainPrep.packShards(spark, sfDir)
    // every (epoch, shard) numbers its docs 1..n with no gaps
    val bad = eo.groupBy($"epoch", $"lang", $"shard_id")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"),
        countDistinct($"pos").as("d"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"d" =!= $"n")
    assert(bad.count() == 0, "positions must be a contiguous 1..n per shard")
    // each epoch covers exactly the packed corpus
    assert(eo.filter($"epoch" === 1).count() == packed.count())
    assert(eo.filter($"epoch" === 2).count() == packed.count())
    // shard serving order is a permutation of shards per epoch
    val shards = packed.select($"lang", $"shard_id").distinct().count()
    val sbad = eo.select($"epoch", $"lang", $"shard_id", $"shard_pos").distinct()
      .groupBy($"epoch")
      .agg(countDistinct($"shard_pos").as("d"), max($"shard_pos").as("mx"))
      .filter($"d" =!= shards || $"mx" =!= shards)
    assert(sbad.count() == 0, "shard_pos must be a 1..nShards permutation per epoch")
    // the two epochs actually shuffle differently (some doc changes pos)
    val moved = eo.filter($"epoch" === 1).as("a")
      .join(eo.filter($"epoch" === 2).as("b"), Seq("lang", "shard_id", "doc_id"))
      .filter($"a.pos" =!= $"b.pos").count()
    assert(moved > 0, "epoch 2 must reorder at least some documents")
    // deterministic across runs
    assert(eo.collect().toSeq == TrainPrep.epochOrder(spark, sfDir).collect().toSeq)
  }

  test("materializeShards: written artifact conserves the manifest and packs one file per shard") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graftshards").toString
    TrainPrep.materializeShards(spark, sfDir, out)
    val back = spark.read.parquet(out)
    // re-derived per-shard stats of the WRITTEN files == the planned
    // manifest, row for row (docs, tokens, id range all conserve)
    val gotStats = back.groupBy($"lang", $"shard_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("shard_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .collect().map(_.toString).sorted.toSeq
    val want = TrainPrep.shardManifest(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(gotStats == want, "written shards diverge from the planned manifest")
    // text survives the round trip byte for byte (anti-join is empty)
    val src = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    assert(back.select($"doc_id", $"text").except(src).count() == 0)
    assert(back.count() == src.count())
    // one parquet file per (lang, shard) directory — the loader's fetch
    // unit, and the no-small-file-spray invariant the write plans for
    val shardDirs = new java.io.File(out).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles.filter(_.isDirectory))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files in one shard")
    }
    // a loader's shard fetch is partition-pruned, not a corpus filter
    val one = back.filter($"lang" === "en" && $"shard_id" === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"shard fetch not pruned:\n$plan")
  }

  test("chunk_docs covers every token and overlaps by stride") {
    import spark.implicits._
    val chunks = TrainPrep.chunkDocs(spark, sfDir)
    val docs = Tables.documentsPar(spark, sfDir)
      .select($"doc_id",
        size(graft.ops.TextAnalysis.toks($"text")).cast("long").as("n_toks"))
    // chunk count per doc = ceil(n/stride); the last chunk reaches the
    // final token (start + len - 1 = n), so no token is orphaned
    val perDoc = chunks.groupBy($"doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(($"chunk_id" * TrainPrep.ChunkStride) + $"n_chunk_tokens").as("reach"))
    val joined = perDoc.join(docs, "doc_id")
    assert(joined.filter(
      $"n_chunks" =!= ceil($"n_toks".cast("double") / TrainPrep.ChunkStride)
        .cast("long")).count() == 0, "chunk count != ceil(n/stride)")
    assert(joined.filter($"reach" =!= $"n_toks").count() == 0,
      "a document's final chunk does not reach its last token")
    // no chunk exceeds the window
    assert(chunks.filter($"n_chunk_tokens" > TrainPrep.ChunkTokens).count() == 0)
  }

  test("split_leakage equals the pair table filtered through datasetSplit") {
    import spark.implicits._
    val leaks = Curate.splitLeakage(spark, sfDir)
    val splits = TrainPrep.datasetSplit(spark, sfDir).select($"doc_id", $"split")
    // the zero-join predicate form must agree with the materialized
    // split table (same hash, two routes)
    val viaJoin = Dedup.sharedJaccardPairs(spark, sfDir)
      .select($"id_a", $"id_b", $"jaccard")
      .join(splits.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
      .join(splits.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
      .filter($"sa" =!= $"sb")
      .select($"id_a", $"id_b")
    assert(leaks.select($"id_a", $"id_b").except(viaJoin).count() == 0)
    assert(viaJoin.except(leaks.select($"id_a", $"id_b")).count() == 0)
  }

  test("dedup_incremental is the cross-batch slice of dedup_jaccard") {
    import spark.implicits._
    val inc = Dedup.dedupIncremental(spark, sfDir)
      .select(least($"new_id", $"old_id").as("id_a"),
        greatest($"new_id", $"old_id").as("id_b"))
    val crossBatch = Dedup.dedupJaccard(spark, sfDir)
      .filter(($"id_a" % 5 === 0) =!= ($"id_b" % 5 === 0))
      .select($"id_a", $"id_b")
    assert(inc.except(crossBatch).count() == 0,
      "incremental found a pair the full funnel does not")
    assert(crossBatch.except(inc).count() == 0,
      "incremental missed a cross-batch pair the full funnel finds")
  }

  test("vocab_topn and source_mix conserve corpus totals") {
    import spark.implicits._
    val vocab = TextAnalysis.vocabTopN(spark, sfDir)
    // frequencies are positive, non-increasing in rank order
    val freqs = vocab.select($"freq").as[Long].collect()
    assert(freqs.forall(_ > 0) && freqs.sameElements(freqs.sortBy(-_)))
    val mix = TextAnalysis.sourceMix(spark, sfDir)
    val nDocs = Tables.documentsPar(spark, sfDir).count()
    assert(mix.agg(sum($"n_docs")).as[Long].head() == nDocs)
    assert(mix.filter($"dup_ratio" < 0 || $"dup_ratio" > 1).count() == 0)
  }

  test("ann_batch_topk agrees with per-query brute force") {
    import spark.implicits._
    val batch = Similarity.annBatchTopK(spark, sfDir)
    // exactly BatchK rows per query, ranks 1..k, scores non-increasing
    val perQ = batch.groupBy($"q_id").agg(
      count(lit(1)).as("n"), min($"rk").as("lo"), max($"rk").as("hi"))
    assert(perQ.filter($"n" =!= Similarity.BatchK || $"lo" =!= 1 ||
      $"hi" =!= Similarity.BatchK).count() == 0)
    val disordered = batch.as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).values.exists { rows =>
        val byRank = rows.sortBy(_._4).map(_._3)
        byRank.zip(byRank.tail).exists { case (a, b) => a < b }
      }
    assert(!disordered, "scores not non-increasing in rank")
  }

  test("contrastive pairs: bars respected, both classes mined, ids ordered") {
    val rows = graft.ops.TrainPrep.contrastivePairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, j, t) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
      assert(a < b, "pair ids canonically ordered")
      if (t == "positive") assert(j >= graft.ops.TrainPrep.PosBar)
      else {
        assert(t == "hard_negative")
        assert(j < graft.ops.TrainPrep.HardNegHi && j >= 0.1,
          "hard negatives are LSH-collided, funnel-verified, below the dup bar")
      }
    }
    val types = rows.map(_.getString(3)).toSet
    assert(types == Set("positive", "hard_negative"),
      s"fixture must mine both classes, got $types")
  }
}
