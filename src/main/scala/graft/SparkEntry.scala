package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The Q5-shaped star join exercises the full relational
    * stack: broadcast dims, fact shuffle, Catalyst join reorder,
    * decimal-exact aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinMultiwayStar(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a scans / sources
    "scan_parquet_full"       -> (Relational.scanParquetFull _),
    "scan_projection_pruning" -> (Relational.scanProjectionPruning _),
    "scan_filter_pushdown"    -> (Relational.scanFilterPushdown _),
    "source_json_lines"       -> (Relational.sourceJsonLines _),
    "source_csv_roundtrip"    -> (Sources.sourceCsvRoundtrip _),
    "source_json_roundtrip"   -> (Sources.sourceJsonRoundtrip _),
    // §2b projections / filters
    "project_expressions"      -> (Relational.projectExpressions _),
    "filter_complex_predicate" -> (Relational.filterComplexPredicate _),
    "filter_null_semantics"    -> (Relational.filterNullSemantics _),
    // §2c joins
    "join_broadcast_inner" -> (Relational.joinBroadcastInner _),
    "join_shuffle_inner"   -> (Relational.joinShuffleInner _),
    "join_multiway_star"   -> (Relational.joinMultiwayStar _),
    "join_left_outer"      -> (Relational.joinLeftOuter _),
    "join_full_outer"      -> (Relational.joinFullOuter _),
    "join_semi"            -> (Relational.joinSemi _),
    "join_anti"            -> (Relational.joinAnti _),
    "join_theta_range"     -> (Relational.joinThetaRange _),
    "join_cross_small"     -> (Relational.joinCrossSmall _),
    "join_asof_last_event" -> (Relational.joinAsofLastEvent _),
    // §2d aggregations
    "agg_hash_groupby"          -> (Relational.aggHashGroupby _),
    "agg_count_distinct"        -> (Aggregates.aggCountDistinct _),
    "agg_approx_count_distinct" -> (Aggregates.aggApproxCountDistinct _),
    "agg_approx_quantiles"      -> (Aggregates.aggApproxQuantiles _),
    "agg_rollup"                -> (Aggregates.aggRollup _),
    "agg_cube"                  -> (Aggregates.aggCube _),
    "agg_grouping_sets"         -> (Aggregates.aggGroupingSets _),
    "agg_stats"                 -> (Aggregates.aggStats _),
    "agg_percentiles"           -> (Aggregates.aggPercentiles _),
    "agg_minmax_by"             -> (Aggregates.aggMinmaxBy _),
    "agg_collect_sorted"        -> (Aggregates.aggCollectSorted _),
    // §2e windows
    "win_ranking"       -> (Analytic.winRanking _),
    "win_topk_per_group" -> (Analytic.winTopkPerGroup _),
    "win_running_frame" -> (Analytic.winRunningFrame _),
    "win_lead_lag"      -> (Analytic.winLeadLag _),
    "win_ntile_dist"    -> (Analytic.winNtileDist _),
    // §2g scalar surface
    "fn_string"      -> (Scalars.fnString _),
    "fn_date_time"   -> (Scalars.fnDateTime _),
    "fn_math"        -> (Scalars.fnMath _),
    "fn_conditional" -> (Scalars.fnConditional _),
    "fn_array"       -> (Scalars.fnArray _),
    "fn_map"         -> (Scalars.fnMap _),
    "fn_json"        -> (Scalars.fnJson _),
    "fn_struct"      -> (Scalars.fnStruct _),
    // §2h streaming batch-equivalents (real streaming paths in
    // Streaming.*Stream, exercised via MemoryStream in StreamingSpec)
    "stream_tumbling_window"    -> (Streaming.streamTumblingWindow _),
    "stream_sliding_window"     -> (Streaming.streamSlidingWindow _),
    "stream_session_window"     -> (Streaming.streamSessionWindow _),
    "stream_dedup"              -> (Streaming.streamDedup _),
    "stream_watermark_late_data" -> (Streaming.streamWatermarkLateData _),
    // §2i ML surface (no oracle except the modulo split; verified by
    // metric floors + determinism in MLSpec)
    "ml_rf_train_predict"      -> (ML.mlRfTrainPredict _),
    "ml_rf_accuracy"           -> (ML.mlRfAccuracy _),
    "ml_rf_feature_importance" -> (ML.mlRfFeatureImportance _),
    "ml_rf_regression"         -> (ML.mlRfRegression _),
    "ml_train_test_split"      -> (ML.mlTrainTestSplit _),
    // §2j LLM-data-pipeline ops
    "dedup_exact_hash"      -> (LlmOps.dedupExactHash _),
    "dedup_near_jaccard"    -> (LlmOps.dedupNearJaccard _),
    "dedup_minhash_lsh"     -> (LlmOps.dedupMinhashLsh _),
    "sim_cosine_topk"       -> (LlmOps.simCosineTopk _),
    "sim_knn_query"         -> (LlmOps.simKnnQuery _),
    "text_tokenize_tf"      -> (LlmOps.textTokenizeTf _),
    "text_ngram_bigrams"    -> (LlmOps.textNgramBigrams _),
    "text_stats_per_source" -> (LlmOps.textStatsPerSource _),
    "multimodal_struct_json" -> (LlmOps.multimodalStructJson _),
    // §2j wave 2: training-data-pipeline extras
    "text_lang_id"        -> (LlmOps2.textLangId _),
    "text_quality_score"  -> (LlmOps2.textQualityScore _),
    "text_token_count"    -> (LlmOps2.textTokenCount _),
    "text_fingerprint"    -> (LlmOps2.textFingerprint _),
    "dedup_simhash"       -> (LlmOps2.dedupSimhash _),
    "dedup_near_embedding" -> (LlmOps2.dedupNearEmbedding _),
    "sim_ann_lsh"         -> (LlmOps2.simAnnLsh _),
    "multimodal_binary_features" -> (LlmOps2.multimodalBinaryFeatures _),
    "multimodal_frame_sample"    -> (LlmOps2.multimodalFrameSample _),
    // scale techniques (SURVEY §2k follow-on): skew salting, bucketed
    // co-located join, partition pruning over a partitioned layout
    "skew_salted_agg"         -> (ScaleTechniques.skewSaltedAgg _),
    "join_bucketed_colocated" -> (ScaleTechniques.joinBucketedColocated _),
    "scan_partition_pruning"  -> (ScaleTechniques.scanPartitionPruning _),
    // typed Dataset surface + the BASELINE q3 anchor
    "agg_typed_aggregator" -> (TypedOps.aggTypedAggregator _),
    "join_q3_topk"         -> (TypedOps.joinQ3Topk _),
    // widened analytics surface (round-1 final batch)
    "win_first_last"    -> (Analytic.winFirstLast _),
    "text_tfidf"        -> (Analytic.textTfidf _),
    "agg_histogram"     -> (Analytic.aggHistogram _),
    "fn_bitwise"        -> (Analytic.fnBitwise _),
    "set_intersect_all" -> (Analytic.setIntersectAll _),
    "set_except_all"    -> (Analytic.setExceptAll _),
    // §2f sorts / limits / set ops
    "sort_multi_key"     -> (Analytic.sortMultiKey _),
    "limit_topk"         -> (Analytic.limitTopk _),
    "set_union_all"      -> (Analytic.setUnionAll _),
    "set_union_distinct" -> (Analytic.setUnionDistinct _),
    "set_intersect"      -> (Analytic.setIntersect _),
    "set_except"         -> (Analytic.setExcept _),
    // round-2 widening: reshape surface
    "agg_pivot"      -> (Reshape.aggPivot _),
    "agg_unpivot"    -> (Reshape.aggUnpivot _),
    "agg_string_agg" -> (Reshape.aggStringAgg _),
    "agg_mode"       -> (Reshape.aggMode _),
    "fn_explode"     -> (Reshape.fnExplode _),
    // round-2 widening: sources + pipeline composites + streaming join
    "source_orc_roundtrip"    -> (Sources.sourceOrcRoundtrip _),
    "sample_stratified"       -> (Pipeline.sampleStratified _),
    "text_pii_mask"           -> (Pipeline.textPiiMask _),
    "pipeline_quality_filter" -> (Pipeline.pipelineQualityFilter _),
    "sim_ann_ivf"             -> (Pipeline.simAnnIvf _),
    "stream_interval_join"    -> (Streaming.streamIntervalJoin _),
    // round-3 widening: n-gram dedup, vector arithmetic, correlated /
    // lateral subqueries, interval range frames, HLL sketches, DT +
    // KMeans learners
    "dedup_ngram_jaccard"   -> (Round3Ops.dedupNgramJaccard _),
    "fn_vector_arith"       -> (Round3Ops.fnVectorArith _),
    "sql_correlated_scalar" -> (Round3Ops.sqlCorrelatedScalar _),
    "join_lateral_agg"      -> (Round3Ops.joinLateralAgg _),
    "win_range_interval"    -> (Round3Ops.winRangeInterval _),
    "agg_hll_sketch"        -> (Round3Ops.aggHllSketch _),
    "ml_dt_train_predict"   -> (ML.mlDtTrainPredict _),
    "ml_kmeans_cluster"     -> (ML.mlKmeansCluster _),
    "agg_regr"              -> (Round3Ops.aggRegr _),
    "skew_salted_join"      -> (Round3Ops.skewSaltedJoin _),
    "agg_count_min_sketch"  -> (Round3Ops.aggCountMinSketch _),
    "fn_generate_series"    -> (Round3Ops.fnGenerateSeries _),
    "dedup_connected_components" -> (Round3Ops.dedupConnectedComponents _),
    "typed_flatmap_sessions"     -> (TypedOps.typedFlatmapSessions _),
    "agg_bool"                   -> (Round3Ops.aggBool _),
    "sql_in_subquery"            -> (Round3Ops.sqlInSubquery _),
    "fn_trig"                    -> (Round3Ops.fnTrig _),
    // round-4 widening (SURVEY §2, round-4 table)
    "join_right_outer"            -> (Round4Ops.joinRightOuter _),
    "sql_cte_chain"               -> (Round4Ops.sqlCteChain _),
    "sql_recursive_cte"           -> (Round4Ops.sqlRecursiveCte _),
    "sql_values_inline"           -> (Round4Ops.sqlValuesInline _),
    "agg_filter_clause"           -> (Round4Ops.aggFilterClause _),
    "agg_distinct_multi"          -> (Round4Ops.aggDistinctMulti _),
    "limit_offset"                -> (Round4Ops.limitOffset _),
    "join_range_bucketed"         -> (Round4Ops.joinRangeBucketed _),
    "sim_centroid_distance"       -> (Round4Ops.simCentroidDistance _),
    "pipeline_contamination_check" -> (Round4Ops.pipelineContaminationCheck _),
    "pipeline_token_budget_pack"  -> (Round4Ops.pipelineTokenBudgetPack _),
    "text_containment"            -> (Round4Ops.textContainment _),
    "stream_topk_per_window"      -> (Round4Ops.streamTopkPerWindow _),
    "text_edit_distance"          -> (Round4Ops2.textEditDistance _),
    "text_keywords_topk"          -> (Round4Ops2.textKeywordsTopk _),
    "fn_try_arith"                -> (Round4Ops2.fnTryArith _),
    "agg_weighted_avg"            -> (Round4Ops2.aggWeightedAvg _),
    "multimodal_chunk_manifest"   -> (Round4Ops2.multimodalChunkManifest _),
    "scan_merge_schema"           -> (Round4Ops2.scanMergeSchema _),
    "win_moving_avg"              -> (Round4Ops2.winMovingAvg _),
    "agg_having"                  -> (Round4Ops2.aggHaving _),
    "win_first_last_ignore_nulls" -> (Round4Ops2.winFirstLastIgnoreNulls _),
    "pipeline_incremental_dedup"  -> (Round4Ops2.pipelineIncrementalDedup _),
    "ml_gbt_train_predict"        -> (ML.mlGbtTrainPredict _),
    "pipeline_upsert"             -> (Round5Ops.pipelineUpsert _),
    "skew_aqe_join"               -> (Round5Ops.skewAqeJoin _),
    "dedup_near_embedding_ann"    -> (Round5Ops.dedupNearEmbeddingAnn _),
    "ml_cross_validation"         -> (ML.mlCrossValidation _),
    // round-7 widening: malformed ingestion, text normalization,
    // sink-side streaming upsert, CV winner surfacing
    "source_csv_malformed"        -> (Sources.sourceCsvMalformed _),
    "text_normalize"              -> (LlmOps2.textNormalize _),
    "stream_foreach_batch_upsert" -> (Streaming.streamForeachBatchUpsert _),
    "ml_cv_best_model"            -> (ML.mlCvBestModel _),
    // round-7 widening, part 2: mixture sampling, repetition quality,
    // SCD2 history, conversion funnel, snapshot diff, cume windows
    "pipeline_mixture_sample"     -> (Round7Ops.pipelineMixtureSample _),
    "text_repetition_filter"      -> (Round7Ops.textRepetitionFilter _),
    "pipeline_scd2"               -> (Round7Ops.pipelineScd2 _),
    "analytic_funnel"             -> (Round7Ops.analyticFunnel _),
    "pipeline_dataset_diff"       -> (Round7Ops.pipelineDatasetDiff _),
    "win_cume_dist"               -> (Round7Ops.winCumeDist _),
    "source_xml_roundtrip"        -> (Sources.sourceXmlRoundtrip _),
    // round-7 widening, part 3: null-aware anti join, bloom semi-join
    // reduction, incremental aggregate maintenance, time-series
    // gap-fill, one-pass column profiling
    "join_null_aware_anti"        -> (Round7Ops2.joinNullAwareAnti _),
    "scale_bloom_prefilter"       -> (Round7Ops2.scaleBloomPrefilter _),
    "pipeline_incremental_agg"    -> (Round7Ops2.pipelineIncrementalAgg _),
    "ts_gap_fill"                 -> (Round7Ops2.tsGapFill _),
    "pipeline_profile_columns"    -> (Round7Ops2.pipelineProfileColumns _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "scan_parquet_full"        -> Oracle.scanParquetFull,
    "scan_projection_pruning"  -> Oracle.scanProjectionPruning,
    "scan_filter_pushdown"     -> Oracle.scanFilterPushdown,
    "source_json_lines"        -> Oracle.sourceJsonLines,
    "source_csv_roundtrip"     -> Oracle.sourceRoundtrip,
    "source_json_roundtrip"    -> Oracle.sourceRoundtrip,
    "project_expressions"      -> Oracle.projectExpressions,
    "filter_complex_predicate" -> Oracle.filterComplexPredicate,
    "filter_null_semantics"    -> Oracle.filterNullSemantics,
    "join_broadcast_inner"     -> Oracle.joinBroadcastInner,
    "join_shuffle_inner"       -> Oracle.joinShuffleInner,
    "join_multiway_star"       -> Oracle.joinMultiwayStar,
    "join_left_outer"          -> Oracle.joinLeftOuter,
    "join_full_outer"          -> Oracle.joinFullOuter,
    "join_semi"                -> Oracle.joinSemi,
    "join_anti"                -> Oracle.joinAnti,
    "join_theta_range"         -> Oracle.joinThetaRange,
    "join_cross_small"         -> Oracle.joinCrossSmall,
    "join_asof_last_event"     -> Oracle.joinAsofLastEvent,
    "agg_hash_groupby"         -> Oracle.aggHashGroupby,
    // agg_approx_count_distinct: NO oracle — HLL is engine-specific;
    // verified in AggregatesSpec against exact counts.
    "agg_count_distinct"       -> Oracle.aggCountDistinct,
    "agg_rollup"               -> Oracle.aggRollup,
    "agg_cube"                 -> Oracle.aggCube,
    "agg_grouping_sets"        -> Oracle.aggGroupingSets,
    "agg_stats"                -> Oracle.aggStats,
    "agg_percentiles"          -> Oracle.aggPercentiles,
    "agg_minmax_by"            -> Oracle.aggMinmaxBy,
    "agg_collect_sorted"       -> Oracle.aggCollectSorted,
    "fn_string"                -> Oracle.fnString,
    "fn_date_time"             -> Oracle.fnDateTime,
    "fn_math"                  -> Oracle.fnMath,
    "fn_conditional"           -> Oracle.fnConditional,
    "fn_array"                 -> Oracle.fnArray,
    "fn_map"                   -> Oracle.fnMap,
    "fn_json"                  -> Oracle.fnJson,
    "fn_struct"                -> Oracle.fnStruct,
    "stream_tumbling_window"   -> Oracle.streamTumblingWindow,
    "stream_sliding_window"    -> Oracle.streamSlidingWindow,
    "stream_session_window"    -> Oracle.streamSessionWindow,
    "stream_dedup"             -> Oracle.streamDedup,
    "stream_watermark_late_data" -> Oracle.streamWatermarkLateData,
    // ml_rf_*: NO oracle — not SQL-expressible (MLSpec asserts metric
    // floors and fixed-seed determinism); the split IS oracle-checked:
    "ml_train_test_split"      -> Oracle.mlTrainTestSplit,
    // dedup_minhash_lsh: NO oracle — hash-family specific; recall vs
    // exact jaccard asserted in LlmSpec.
    "dedup_exact_hash"         -> Oracle.dedupExactHash,
    "dedup_near_jaccard"       -> Oracle.dedupNearJaccard,
    "sim_cosine_topk"          -> Oracle.simCosineTopk,
    "sim_knn_query"            -> Oracle.simKnnQuery,
    "text_tokenize_tf"         -> Oracle.textTokenizeTf,
    "text_ngram_bigrams"       -> Oracle.textNgramBigrams,
    "text_stats_per_source"    -> Oracle.textStatsPerSource,
    "multimodal_struct_json"   -> Oracle.multimodalStructJson,
    // sim_ann_lsh: NO oracle — LSH bucketing is hash-family specific;
    // recall vs brute force asserted in LlmSpec.
    "text_lang_id"             -> Oracle.textLangId,
    "text_quality_score"       -> Oracle.textQualityScore,
    "text_token_count"         -> Oracle.textTokenCount,
    "text_fingerprint"         -> Oracle.textFingerprint,
    "dedup_simhash"            -> Oracle.dedupSimhash,
    "dedup_near_embedding"     -> Oracle.dedupNearEmbedding,
    "multimodal_binary_features" -> Oracle.multimodalBinaryFeatures,
    "multimodal_frame_sample"    -> Oracle.multimodalFrameSample,
    "agg_typed_aggregator"     -> Oracle.aggTypedAggregator,
    "join_q3_topk"             -> Oracle.joinQ3Topk,
    "skew_salted_agg"          -> Oracle.skewSaltedAgg,
    "join_bucketed_colocated"  -> Oracle.joinBucketedColocated,
    "scan_partition_pruning"   -> Oracle.scanPartitionPruning,
    "win_first_last"           -> Oracle.winFirstLast,
    "text_tfidf"               -> Oracle.textTfidf,
    "agg_histogram"            -> Oracle.aggHistogram,
    "fn_bitwise"               -> Oracle.fnBitwise,
    "set_intersect_all"        -> Oracle.setIntersectAll,
    "set_except_all"           -> Oracle.setExceptAll,
    "win_ranking"              -> Oracle.winRanking,
    "win_topk_per_group"       -> Oracle.winTopkPerGroup,
    "win_running_frame"        -> Oracle.winRunningFrame,
    "win_lead_lag"             -> Oracle.winLeadLag,
    "win_ntile_dist"           -> Oracle.winNtileDist,
    "sort_multi_key"           -> Oracle.sortMultiKey,
    "limit_topk"               -> Oracle.limitTopk,
    "set_union_all"            -> Oracle.setUnionAll,
    "set_union_distinct"       -> Oracle.setUnionDistinct,
    "set_intersect"            -> Oracle.setIntersect,
    "set_except"               -> Oracle.setExcept,
    "agg_pivot"                -> Oracle.aggPivot,
    "agg_unpivot"              -> Oracle.aggUnpivot,
    "agg_string_agg"           -> Oracle.aggStringAgg,
    "agg_mode"                 -> Oracle.aggMode,
    "fn_explode"               -> Oracle.fnExplode,
    "source_orc_roundtrip"     -> Oracle.sourceRoundtrip,
    "sample_stratified"        -> Oracle.sampleStratified,
    "text_pii_mask"            -> Oracle.textPiiMask,
    "pipeline_quality_filter"  -> Oracle.pipelineQualityFilter,
    // sim_ann_ivf: NO oracle — centroid assignment is engine-specific;
    // recall vs exact kNN asserted in PipelineSpec.
    "stream_interval_join"     -> Oracle.streamIntervalJoin,
    // round-3 widening. agg_hll_sketch: NO oracle — DataSketches HLL
    // binary is engine-specific (AggregatesSpec bounds both levels vs
    // exact). ml_dt_train_predict / ml_kmeans_cluster: NO oracle — not
    // SQL-expressible (MLSpec asserts determinism + structure).
    "dedup_ngram_jaccard"      -> Oracle.dedupNgramJaccard,
    "fn_vector_arith"          -> Oracle.fnVectorArith,
    "sql_correlated_scalar"    -> Oracle.sqlCorrelatedScalar,
    "join_lateral_agg"         -> Oracle.joinLateralAgg,
    "win_range_interval"       -> Oracle.winRangeInterval,
    // agg_count_min_sketch: NO oracle — sketch layout engine-specific
    // (AggregatesSpec bounds estimates vs exact counts).
    "agg_regr"                 -> Oracle.aggRegr,
    "skew_salted_join"         -> Oracle.skewSaltedJoin,
    "fn_generate_series"       -> Oracle.fnGenerateSeries,
    "dedup_connected_components" -> Oracle.dedupConnectedComponents,
    "typed_flatmap_sessions"     -> Oracle.typedFlatmapSessions,
    "agg_bool"                   -> Oracle.aggBool,
    "sql_in_subquery"            -> Oracle.sqlInSubquery,
    "fn_trig"                    -> Oracle.fnTrig,
    // round-4 widening
    "join_right_outer"            -> Oracle.joinRightOuter,
    "sql_cte_chain"               -> Oracle.sqlCteChain,
    "sql_recursive_cte"           -> Oracle.sqlRecursiveCte,
    "sql_values_inline"           -> Oracle.sqlValuesInline,
    "agg_filter_clause"           -> Oracle.aggFilterClause,
    "agg_distinct_multi"          -> Oracle.aggDistinctMulti,
    "limit_offset"                -> Oracle.limitOffset,
    "join_range_bucketed"         -> Oracle.joinRangeBucketed,
    "sim_centroid_distance"       -> Oracle.simCentroidDistance,
    "pipeline_contamination_check" -> Oracle.pipelineContaminationCheck,
    "pipeline_token_budget_pack"  -> Oracle.pipelineTokenBudgetPack,
    "text_containment"            -> Oracle.textContainment,
    "stream_topk_per_window"      -> Oracle.streamTopkPerWindow,
    "text_edit_distance"          -> Oracle.textEditDistance,
    "text_keywords_topk"          -> Oracle.textKeywordsTopk,
    "fn_try_arith"                -> Oracle.fnTryArith,
    "agg_weighted_avg"            -> Oracle.aggWeightedAvg,
    "multimodal_chunk_manifest"   -> Oracle.multimodalChunkManifest,
    "scan_merge_schema"           -> Oracle.scanMergeSchema,
    "win_moving_avg"              -> Oracle.winMovingAvg,
    "agg_having"                  -> Oracle.aggHaving,
    "win_first_last_ignore_nulls" -> Oracle.winFirstLastIgnoreNulls,
    "pipeline_incremental_dedup"  -> Oracle.pipelineIncrementalDedup,
    // ml_gbt_train_predict: NO oracle — not SQL-expressible (MLSpec
    // asserts determinism + binary-target coverage).
    "pipeline_upsert"             -> Oracle.pipelineUpsert,
    "skew_aqe_join"               -> Oracle.skewAqeJoin,
    // dedup_near_embedding_ann: NO oracle — SRP hash-family specific
    // (recall vs the exact grid plan asserted in Round5Spec).
    // ml_cross_validation: NO oracle — fold assignment engine-specific
    // (structure + metric range asserted in MLSpec).
    // round-7 widening. ml_cv_best_model: NO oracle — fold assignment
    // engine-specific (winner determinism asserted in MLSpec).
    "source_csv_malformed"        -> Oracle.sourceCsvMalformed,
    "text_normalize"              -> Oracle.textNormalize,
    "stream_foreach_batch_upsert" -> Oracle.streamForeachBatchUpsert,
    // round-7 widening, part 2 — all six oracle-checked
    "pipeline_mixture_sample"     -> Oracle.pipelineMixtureSample,
    "text_repetition_filter"      -> Oracle.textRepetitionFilter,
    "pipeline_scd2"               -> Oracle.pipelineScd2,
    "analytic_funnel"             -> Oracle.analyticFunnel,
    "pipeline_dataset_diff"       -> Oracle.pipelineDatasetDiff,
    "win_cume_dist"               -> Oracle.winCumeDist,
    "source_xml_roundtrip"        -> Oracle.sourceRoundtrip,
    "join_null_aware_anti"        -> Oracle.joinNullAwareAnti,
    "scale_bloom_prefilter"       -> Oracle.scaleBloomPrefilter,
    "pipeline_incremental_agg"    -> Oracle.pipelineIncrementalAgg,
    "ts_gap_fill"                 -> Oracle.tsGapFill,
    "pipeline_profile_columns"    -> Oracle.pipelineProfileColumns,
  )
}
