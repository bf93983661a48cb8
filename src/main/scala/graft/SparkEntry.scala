package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6-2.9 relational surface
    "q1_agg" -> (Relational.q1Agg _),
    "join_star" -> (Relational.joinStar _),
    "join_left" -> (Relational.joinLeft _),
    "agg_distinct" -> (Relational.aggDistinct _),
    "agg_hll" -> (Relational.aggHll _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_cube" -> (Relational.aggCube _),
    "window_funcs" -> (Relational.windowFuncs _),
    "topk" -> (Relational.topK _),
    "set_union" -> (Relational.setUnion _),
    "set_intersect" -> (Relational.setIntersect _),
    "set_except" -> (Relational.setExcept _),
    // reference surface (SURVEY §2.1-2.4, §2.10)
    "ingest_transform" -> (Ingest.ingestTransform _),
    "ingest_enrich" -> (Ingest.ingestEnrich _),
    "parse_valid" -> (Ingest.parseValid _),
    "parse_dlq" -> (Ingest.parseDlq _),
    "dedup_by_key" -> (Ingest.dedupByKey _),
    "ack_semi_join" -> (Ingest.ackSemiJoin _),
    "nack_anti_join" -> (Ingest.nackAntiJoin _),
    "daily_partitions" -> (Ingest.dailyPartitions _),
    "scalar_funcs" -> (Ingest.scalarFuncs _),
    "explode_tags" -> (Ingest.explodeTags _),
    "tags_exists" -> (Ingest.tagsExists _),
    "search_filter" -> (Ingest.searchFilter _),
    // relational breadth: multiset ops, pivot, range join
    "set_intersect_all" -> (Extras.setIntersectAll _),
    "set_except_all" -> (Extras.setExceptAll _),
    "pivot_counts" -> (Extras.pivotCounts _),
    "range_join_bucketed" -> (Extras.rangeJoinBucketed _),
    "salted_agg" -> (Salted.saltedAgg _),
    "topk_per_group" -> (GroupTop.topKPerGroup _),
    "agg_collect" -> (GroupTop.aggCollect _),
    "dedup_editdist" -> (Extras.dedupEditDist _),
    // temporal extensions (as-of join, session windows, percentiles)
    "asof_join" -> (Temporal.asofJoin _),
    "session_windows" -> (Temporal.sessionWindows _),
    "agg_percentile" -> (Temporal.aggPercentile _),
    "sliding_counts" -> (TimeWindows.slidingCounts _),
    "agg_approx_percentile" -> (TimeWindows.aggApproxPercentile _),
    // LLM-pipeline: dedup over documents (north star, SURVEY §7.2.5)
    "dedup_exact" -> (Dedup.dedupExact _),
    "minhash_sig" -> (Dedup.minhashSig _),
    "lsh_pairs" -> (Dedup.lshPairs _),
    "dedup_jaccard" -> (Dedup.dedupJaccard _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_clusters" -> (Dedup.dedupClusters _),
    // LLM-pipeline: similarity search over embeddings
    "ann_topk" -> (Similarity.annTopK _),
    "ann_ivf" -> (Similarity.annIvf _),
    "embed_neardup" -> (Similarity.embedNearDup _),
    // LLM-pipeline: text analysis over documents
    "lang_id" -> (TextAnalysis.langId _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "token_count" -> (TextAnalysis.tokenCount _),
    "doc_fingerprint" -> (TextAnalysis.docFingerprint _),
    "pii_scrub" -> (TextAnalysis.piiScrub _),
    "repetition_ratio" -> (TextAnalysis.repetitionRatio _),
    "decontaminate" -> (TextAnalysis.decontaminate _),
    // LLM-pipeline: multimodal binary columns (decode stubbed; plumbing real)
    "multimodal_meta" -> (Multimodal.multimodalMeta _),
    "multimodal_features" -> (Multimodal.multimodalFeatures _),
    // LLM-pipeline: end-to-end curation (stage composition)
    "corpus_curate" -> (Curate.corpusCurate _),
    // LLM-pipeline: training prep (splits, shard packing)
    "dataset_split" -> (TrainPrep.datasetSplit _),
    "pack_shards" -> (TrainPrep.packShards _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "join_star" -> Relational.joinStarSql,
    "join_left" -> Relational.joinLeftSql,
    "agg_distinct" -> Relational.aggDistinctSql,
    "agg_rollup" -> Relational.aggRollupSql,
    "agg_cube" -> Relational.aggCubeSql,
    "window_funcs" -> Relational.windowFuncsSql,
    "topk" -> Relational.topKSql,
    "set_union" -> Relational.setUnionSql,
    "set_intersect" -> Relational.setIntersectSql,
    "set_except" -> Relational.setExceptSql,
    "ingest_transform" -> Ingest.ingestTransformSql,
    "parse_valid" -> Ingest.parseValidSql,
    "parse_dlq" -> Ingest.parseDlqSql,
    "dedup_by_key" -> Ingest.dedupByKeySql,
    "ack_semi_join" -> Ingest.ackSemiJoinSql,
    "nack_anti_join" -> Ingest.nackAntiJoinSql,
    "daily_partitions" -> Ingest.dailyPartitionsSql,
    "scalar_funcs" -> Ingest.scalarFuncsSql,
    "explode_tags" -> Ingest.explodeTagsSql,
    "tags_exists" -> Ingest.tagsExistsSql,
    "search_filter" -> Ingest.searchFilterSql,
    "set_intersect_all" -> Extras.setIntersectAllSql,
    "set_except_all" -> Extras.setExceptAllSql,
    "pivot_counts" -> Extras.pivotCountsSql,
    "range_join_bucketed" -> Extras.rangeJoinBucketedSql,
    "salted_agg" -> Salted.saltedAggSql,
    "topk_per_group" -> GroupTop.topKPerGroupSql,
    "agg_collect" -> GroupTop.aggCollectSql,
    "dedup_editdist" -> Extras.dedupEditDistSql,
    "asof_join" -> Temporal.asofJoinSql,
    "session_windows" -> Temporal.sessionWindowsSql,
    "agg_percentile" -> Temporal.aggPercentileSql,
    "sliding_counts" -> TimeWindows.slidingCountsSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "minhash_sig" -> Dedup.minhashSigSql,
    "lsh_pairs" -> Dedup.lshPairsSql,
    "dedup_jaccard" -> Dedup.dedupJaccardSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
    "ann_topk" -> Similarity.annTopKSql,
    "ann_ivf" -> Similarity.annIvfSql,
    "embed_neardup" -> Similarity.embedNearDupSql,
    "lang_id" -> TextAnalysis.langIdSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "token_count" -> TextAnalysis.tokenCountSql,
    "doc_fingerprint" -> TextAnalysis.docFingerprintSql,
    "pii_scrub" -> TextAnalysis.piiScrubSql,
    "repetition_ratio" -> TextAnalysis.repetitionRatioSql,
    "decontaminate" -> TextAnalysis.decontaminateSql,
    "multimodal_meta" -> Multimodal.multimodalMetaSql,
    "corpus_curate" -> Curate.corpusCurateSql,
    "dataset_split" -> TrainPrep.datasetSplitSql,
    "pack_shards" -> TrainPrep.packShardsSql,
  )
}
