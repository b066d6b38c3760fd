package graft.engine

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry wiring query keys (SURVEY.md §2.2) to their
  * implementations and oracle SQL. ListMap keeps declaration order
  * stable so bench JSON diffs stay clean (SURVEY.md §7.4-7).
  */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  val queries: ListMap[String, Q] = ListMap(
    // A. scans / sources
    "scan_project_filter" -> QueriesCore.scanProjectFilter _,
    "scan_events_ns"      -> QueriesCore.scanEventsNs _,
    "source_param_table"  -> QueriesCore.sourceParamTable _,
    // B. projections / filters
    "filter_compound"     -> QueriesCore.filterCompound _,
    "project_expressions" -> QueriesCore.projectExpressions _,
    // C. joins
    "q3_top_unshipped"    -> QueriesCore.q3TopUnshipped _,
    "q5_multiway_join"    -> QueriesCore.q5MultiwayJoin _,
    "join_left_right_full" -> QueriesCore.joinLeftRightFull _,
    "join_semi_anti"      -> QueriesCore.joinSemiAnti _,
    "join_broadcast"      -> QueriesCore.joinBroadcast _,
    "join_cross_limited"  -> QueriesCore.joinCrossLimited _,
    // D. aggregations
    "q1_pricing_summary"  -> QueriesCore.q1PricingSummary _,
    "agg_having_distinct" -> QueriesCore.aggHavingDistinct _,
    "distinct_exact"      -> QueriesCore.distinctExact _,
    "agg_rollup"          -> QueriesCore.aggRollup _,
    // E. windows
    "window_rank_frame"   -> QueriesCore.windowRankFrame _,
    "topk_per_group"      -> QueriesCore.topkPerGroup _,
    // F. sorts / limits
    "sort_multikey_nulls" -> QueriesCore.sortMultikeyNulls _,
    "limit_offset_topk"   -> QueriesCore.limitOffsetTopk _,
    // G. set operations
    "setop_union"         -> QueriesCore.setopUnion _,
    "setop_intersect_except" -> QueriesCore.setopIntersectExcept _,
    // A/C/D/E wave-2 breadth
    "scan_multiformat"    -> QueriesRel2.scanMultiformat _,
    "scan_orc_roundtrip"  -> QueriesRel2.scanOrcRoundtrip _,
    "join_theta_range"    -> QueriesRel2.joinThetaRange _,
    "join_asof"           -> QueriesRel2.joinAsof _,
    "param_grid_cross"    -> QueriesRel2.paramGridCross _,
    "distinct_approx"     -> QueriesRel2.distinctApprox _,
    "agg_cube_gsets"      -> QueriesRel2.aggCubeGsets _,
    "agg_stats"           -> QueriesRel2.aggStats _,
    "agg_collect_sorted"  -> QueriesRel2.aggCollectSorted _,
    "window_ranking_matrix" -> QueriesRel2.windowRankingMatrix _,
    "window_analytic"     -> QueriesRel2.windowAnalytic _,
    "window_range_frame"  -> QueriesRel2.windowRangeFrame _,
    // H. streaming semantics over events
    "events_tumbling"     -> QueriesEvents.eventsTumbling _,
    "events_sliding"      -> QueriesEvents.eventsSliding _,
    "events_session"      -> QueriesEvents.eventsSession _,
    "events_watermark_late" -> QueriesEvents.eventsWatermarkLate _,
    "events_watermark_late_perkey" -> QueriesEvents.eventsWatermarkLatePerkey _,
    "events_stateful_dedup" -> QueriesEvents.eventsStatefulDedup _,
    "events_json_props"   -> QueriesEvents.eventsJsonProps _,
    // I. scalar function matrix
    "fn_string"           -> QueriesFn.fnString _,
    "fn_date"             -> QueriesFn.fnDate _,
    "fn_math"             -> QueriesFn.fnMath _,
    "fn_array"            -> QueriesFn.fnArray _,
    "fn_array_explode"    -> QueriesFn.fnArrayExplode _,
    "fn_map"              -> QueriesFn.fnMap _,
    "fn_json"             -> QueriesFn.fnJson _,
    "fn_conditional"      -> QueriesFn.fnConditional _,
    // J. LLM-data-pipeline operators
    "docs_dedup_exact"    -> QueriesDocs.docsDedupExact _,
    "docs_token_stats"    -> QueriesDocs.docsTokenStats _,
    "docs_lang_filter_tf" -> QueriesDocs.docsLangFilterTf _,
    "docs_tfidf_topk"     -> QueriesDocs.docsTfidfTopk _,
    "docs_dedup_near"     -> QueriesDocs.docsDedupNear _,
    "emb_knn_bruteforce"  -> QueriesDocs.embKnnBruteforce _,
    "emb_centroid_per_label" -> QueriesDocs.embCentroidPerLabel _,
    "emb_norm_filter"     -> QueriesDocs.embNormFilter _,
    // K. UDF / UDAF / UDTF / native Expression surface
    "udf_scalar_haversine" -> QueriesExt.udfScalarHaversine _,
    "udaf_typed_geomean"  -> QueriesExt.udafTypedGeomean _,
    "udtf_generator_ngrams" -> QueriesExt.udtfGeneratorNgrams _,
    "expr_native_cosine"  -> QueriesExt.exprNativeCosine _,
    // Beyond-SURVEY training-data-pipeline operators
    "docs_lang_id"        -> QueriesExtra.docsLangId _,
    "docs_quality_score"  -> QueriesExtra.docsQualityScore _,
    "docs_fingerprint"    -> QueriesExtra.docsFingerprint _,
    "docs_token_bpe"      -> QueriesExtra.docsTokenBpe _,
    "emb_ann_ivf"         -> QueriesExtra.embAnnIvf _,
    "join_bucketed"       -> QueriesExtra.joinBucketed _,
    "agg_salted_skew"     -> QueriesExtra.aggSaltedSkew _,
    "agg_distinct_hll"    -> QueriesExtra.aggDistinctHll _,
    "sink_partitioned"    -> QueriesExtra.sinkPartitioned _,
    "multimodal_decode_png" -> QueriesExtra.multimodalDecodePng _,
    "multimodal_frame_sample" -> QueriesExtra.multimodalFrameSample _,
    // Dedup family completion: SimHash, char-ngram Jaccard, cosine
    "docs_dedup_simhash"  -> QueriesDedup.docsDedupSimhash _,
    "docs_dedup_ngram_jaccard" -> QueriesDedup.docsDedupNgramJaccard _,
    "emb_dedup_cosine"    -> QueriesDedup.embDedupCosine _,
    "docs_dedup_resolve"  -> QueriesDedup.docsDedupResolve _,
    "docs_dedup_cc"       -> QueriesDedup.docsDedupCc _,
    // Round-2 coverage wave: reshaping, order stats, sampling, redaction
    "agg_percentiles"     -> QueriesR2.aggPercentiles _,
    "agg_argminmax"       -> QueriesR2.aggArgminmax _,
    "pivot_status_matrix" -> QueriesR2.pivotStatusMatrix _,
    "unpivot_balance_metrics" -> QueriesR2.unpivotBalanceMetrics _,
    "sample_hash_deterministic" -> QueriesR2.sampleHashDeterministic _,
    "fn_string_similarity" -> QueriesR2.fnStringSimilarity _,
    "docs_pii_redact"     -> QueriesR2.docsPiiRedact _,
    "ts_gap_fill"         -> QueriesR2.tsGapFill _,
    "emb_quantize_int8"   -> QueriesR2.embQuantizeInt8 _,
    "fn_bitwise"          -> QueriesR2.fnBitwise _,
    "window_ignore_nulls" -> QueriesR2.windowIgnoreNulls _,
    "sample_stratified"   -> QueriesR2.sampleStratified _,
    "agg_histogram"       -> QueriesR2.aggHistogram _,
    "emb_ivf_recall"      -> QueriesR2.embIvfRecall _,
    "emb_ann_lsh"         -> QueriesR2.embAnnLsh _,
    "docs_entropy"        -> QueriesR2.docsEntropy _,
    "events_funnel"       -> QueriesR2.eventsFunnel _,
    "events_retention"    -> QueriesR2.eventsRetention _,
    "events_anomaly_zscore" -> QueriesR2.eventsAnomalyZscore _,
    "fn_trig"             -> QueriesR2.fnTrig _,
    "agg_weighted_stats"  -> QueriesR2.aggWeightedStats _,
    // Round-3 coverage wave: join-at-scale recipes, deep relational,
    // random-projection dim reduction
    "join_range_binned"   -> QueriesR3.joinRangeBinned _,
    "join_skew_salted"    -> QueriesR3.joinSkewSalted _,
    "q18_large_orders"    -> QueriesR3.q18LargeOrders _,
    "q10_returned_revenue" -> QueriesR3.q10ReturnedRevenue _,
    "emb_random_projection" -> QueriesR3.embRandomProjection _,
    "docs_chunk_windows"  -> QueriesR3.docsChunkWindows _,
    "docs_contamination"  -> QueriesR3.docsContamination _,
    "docs_repetition"     -> QueriesR3.docsRepetition _,
    "docs_source_mix"     -> QueriesR3.docsSourceMix _,
    "scan_schema_evolution" -> QueriesR3.scanSchemaEvolution _,
    "events_session_native" -> QueriesR3.eventsSessionNative _,
    "events_topk_per_window" -> QueriesR3.eventsTopkPerWindow _,
    // Round-4 coverage wave: correlated-subquery planning surface
    "q17_small_qty_revenue" -> QueriesR4.q17SmallQtyRevenue _,
    "q21_last_shipper"    -> QueriesR4.q21LastShipper _,
    "q22_idle_balance"    -> QueriesR4.q22IdleBalance _,
    "docs_pack_sequences" -> QueriesR4.docsPackSequences _,
    "graph_pagerank"      -> QueriesR4.graphPagerank _,
    "merge_upsert_scd1"   -> QueriesR4.mergeUpsertScd1 _,
    "multimodal_decode_wav" -> QueriesExtra.multimodalDecodeWav _,
    // Round-4 wave 2: remaining SQL planning surfaces + corpus-mix ops
    "q14_promo_ratio"     -> QueriesR5.q14PromoRatio _,
    "q19_disjunctive_pred" -> QueriesR5.q19DisjunctivePred _,
    "join_notin_nullaware" -> QueriesR5.joinNotinNullaware _,
    "join_lateral_topk"   -> QueriesR5.joinLateralTopk _,
    "subquery_select_scalar" -> QueriesR5.subquerySelectScalar _,
    "cte_recursive_months" -> QueriesR5.cteRecursiveMonths _,
    "docs_span_dedup"     -> QueriesR5.docsSpanDedup _,
    "docs_token_budget_mix" -> QueriesR5.docsTokenBudgetMix _,
    // Round-4 wave 3: dual-role dimensions, outer-join histogram,
    // max-of-aggregate selection, LM quality scoring, PQ/ADC search
    "q7_volume_shipping"  -> QueriesR6.q7VolumeShipping _,
    "q8_market_share"     -> QueriesR6.q8MarketShare _,
    "q13_order_count_dist" -> QueriesR6.q13OrderCountDist _,
    "q15_top_supplier"    -> QueriesR6.q15TopSupplier _,
    "docs_lm_score"       -> QueriesR6.docsLmScore _,
    "docs_lm_bigram"      -> QueriesR6.docsLmBigram _,
    "emb_pq_adc"          -> QueriesR6.embPqAdc _,
    "emb_ivf_pq"          -> QueriesR6.embIvfPq _,
    "merge_upsert_scd2"   -> QueriesR6.mergeUpsertScd2 _,
    // Round-4 wave 4: null-safe equi join, ANSI try_* arithmetic,
    // vocabulary coverage
    "join_nullsafe_eq"    -> QueriesR7.joinNullsafeEq _,
    "fn_try_arith"        -> QueriesR7.fnTryArith _,
    "docs_oov_rate"       -> QueriesR7.docsOovRate _,
    "dq_constraints"      -> QueriesR7.dqConstraints _,
    "q9_product_profit"   -> QueriesR7.q9ProductProfit _,
    "docs_dedup_weights"  -> QueriesR7.docsDedupWeights _,
    "window_interval_range" -> QueriesR7.windowIntervalRange _,
    "q4_order_priority"   -> QueriesR7.q4OrderPriority _,
    "q6_forecast_revenue" -> QueriesR7.q6ForecastRevenue _,
    "events_distinct_users" -> QueriesR7.eventsDistinctUsers _,
    // Round-5 wave 1: dynamic partition pruning proven, unicode text
    // normalization, interval join as declared key, image patchify
    "scan_dpp_partitioned" -> QueriesR8.scanDppPartitioned _,
    "docs_text_normalize"  -> QueriesR8.docsTextNormalize _,
    "events_interval_join" -> QueriesR8.eventsIntervalJoin _,
    "multimodal_patchify"  -> QueriesR8.multimodalPatchify _,
    "agg_quantile_sketch"  -> QueriesR8.aggQuantileSketch _,
    "docs_train_split"     -> QueriesR8.docsTrainSplit _,
    "docs_corpus_pipeline" -> QueriesR8.docsCorpusPipeline _,
    "multimodal_resize"    -> QueriesR8.multimodalResize _,
    "docs_bpe_pairs"       -> QueriesR8.docsBpePairs _,
    "join_fuzzy_blocked"   -> QueriesR8.joinFuzzyBlocked _,
    "docs_stratified_sample" -> QueriesR8.docsStratifiedSample _,
    "events_resample_gapfill" -> QueriesR8.eventsResampleGapfill _,
    "events_gapfill_interp" -> QueriesR8.eventsGapfillInterp _,
    // Round-6: runtime row-grain scan pruning (bloom join + sorted
    // row-group skip), directional asof, heavy-hitters sketch, BPE
    "join_runtime_bloom"   -> QueriesR9.joinRuntimeBloom _,
    "scan_sorted_skip"     -> QueriesR9.scanSortedSkip _,
    "join_asof_nearest"    -> QueriesR9.joinAsofNearest _,
    "agg_heavy_hitters"    -> QueriesR9.aggHeavyHitters _,
    "docs_bpe_train"       -> QueriesR9.docsBpeTrain _,
    "scan_zorder_skip"     -> QueriesR9.scanZorderSkip _,
    "join_bloom_prefilter" -> QueriesR9.joinBloomPrefilter _,
    "docs_bpe_tokenize"    -> QueriesR9.docsBpeTokenize _,
    "graph_triangles"      -> QueriesR9.graphTriangles _,
    "multimodal_audio_energy" -> QueriesR9.multimodalAudioEnergy _,
    // Round-7: tokenizer output surface, ANN recall matrix, lineage
    // scans, native Generator UDTF, set-overlap sketch
    "docs_bpe_encode"      -> QueriesR10.docsBpeEncode _,
    "scan_glob_lineage"    -> QueriesR10.scanGlobLineage _,
    "udtf_ngrams_native"   -> QueriesR10.udtfNgramsNative _,
    "emb_recall_matrix"    -> QueriesR10.embRecallMatrix _,
    "agg_set_overlap"      -> QueriesR10.aggSetOverlap _,
    "scan_zorder_dpp"      -> QueriesR10.scanZorderDpp _,
    // Round-8: cluster-scoped semantic dedup, inverted-index sparse
    // similarity, perplexity bucketing
    "emb_semdedup"         -> QueriesR11.embSemdedup _,
    "docs_sparse_sim_topk" -> QueriesR11.docsSparseSimTopk _,
    "docs_perplexity_buckets" -> QueriesR11.docsPerplexityBuckets _,
    "events_ewma"          -> QueriesR11.eventsEwma _,
    "agg_incremental_refresh" -> QueriesR11.aggIncrementalRefresh _,
    "dq_profile_drift"     -> QueriesR11.dqProfileDrift _,
    "maintenance_compact"  -> QueriesR11.maintenanceCompact _,
    "join_spatial_grid"    -> QueriesR11.joinSpatialGrid _,
    "docs_pmi_cooccur"     -> QueriesR11.docsPmiCooccur _,
    "sink_partition_overwrite" -> QueriesR11.sinkPartitionOverwrite _,
    "emb_matryoshka_eval"  -> QueriesR11.embMatryoshkaEval _,
    "scan_text_gzip"       -> QueriesR11.scanTextGzip _,
    "scan_json_corrupt"    -> QueriesR11.scanJsonCorrupt _,
    "agg_mode_exact"       -> QueriesR11.aggModeExact _,
    "docs_sentence_split"  -> QueriesR11.docsSentenceSplit _,
    "emb_pca_power"        -> QueriesR11.embPcaPower _,
    // Round-9: ordered-aggregation primitives — OHLC boundary bars
    // and the first-order Markov transition matrix
    "events_ohlc"          -> QueriesR12.eventsOhlc _,
    "events_markov_transitions" -> QueriesR12.eventsMarkovTransitions _,
    "docs_dedup_incremental" -> QueriesR12.docsDedupIncremental _,
    // Round-9 wave 3: model-in-the-loop corpus ops — kNN label
    // propagation and the trained logistic-regression quality filter
    "emb_knn_classify"     -> QueriesR13.embKnnClassify _,
    "docs_quality_logreg"  -> QueriesR13.docsQualityLogreg _,
    "events_cep_pattern"   -> QueriesR13.eventsCepPattern _,
    "multimodal_phash_dedup" -> QueriesR13.multimodalPhashDedup _,
    "docs_gopher_rules"    -> QueriesR13.docsGopherRules _,
    "multimodal_phash_near" -> QueriesR13.multimodalPhashNear _,
    "fn_regexp"            -> QueriesR13.fnRegexp _,
    "emb_knn_outlier_score" -> QueriesR13.embKnnOutlierScore _,
    "emb_knn_eval"          -> QueriesR13.embKnnEval _,
    "basket_assoc_rules"    -> QueriesR13.basketAssocRules _,
    "docs_phrase_search"    -> QueriesR13.docsPhraseSearch _,
    "events_attribution"    -> QueriesR13.eventsAttribution _,
    // Round-9 wave 7: graph neighborhood similarity, clickstream
    // path mining, and time-weighted averaging
    "graph_jaccard_neighbors" -> QueriesR14.graphJaccardNeighbors _,
    "events_user_paths"     -> QueriesR14.eventsUserPaths _,
    "events_twap_daily"     -> QueriesR14.eventsTwapDaily _,
    "orders_rfm_segments"   -> QueriesR14.ordersRfmSegments _,
    "events_anomaly_mad"    -> QueriesR14.eventsAnomalyMad _,
    "merge_upsert_delete"   -> QueriesR14.mergeUpsertDelete _,
    "emb_maxsim_topk"       -> QueriesR14.embMaxsimTopk _,
    "emb_sign_hamming_topk" -> QueriesR14.embSignHammingTopk _,
    "orders_cohort_ltv"     -> QueriesR14.ordersCohortLtv _,
    "docs_bm25_topk"        -> QueriesR14.docsBm25Topk _,
    "events_peak_concurrency" -> QueriesR14.eventsPeakConcurrency _,
    "events_hll_daily"      -> QueriesR14.eventsHllDaily _,
    "docs_keyphrase_rake"   -> QueriesR14.docsKeyphraseRake _,
    "events_ab_test"        -> QueriesR14.eventsAbTest _,
    "events_changepoint"    -> QueriesR14.eventsChangepoint _,
    "join_pit_scd2"         -> QueriesR14.joinPitScd2 _,
    "fn_hash"               -> QueriesR14.fnHash _,
    "multimodal_pixel_stats" -> QueriesR14.multimodalPixelStats _,
    "events_rolling_wau"    -> QueriesR14.eventsRollingWau _,
    // Round-10: ANN-candidate -> MaxSim re-score composition and the
    // JPEG leg of the multimodal decode family
    "emb_maxsim_ann"        -> QueriesR15.embMaxsimAnn _,
    "multimodal_decode_jpeg" -> QueriesR15.multimodalDecodeJpeg _,
    // Round-10: log-structured transactional table (LakeTable)
    "lake_time_travel"      -> QueriesR15.lakeTimeTravel _,
    "lake_merge_upsert"     -> QueriesR15.lakeMergeUpsert _,
    "lake_change_feed"      -> QueriesR15.lakeChangeFeed _,
    "lake_data_skipping"    -> QueriesR15.lakeDataSkipping _,
    "lake_schema_evolution" -> QueriesR15.lakeSchemaEvolution _,
    // Round-10: ANN index maintenance (frozen codebook, delta assign)
    "emb_ann_incremental"   -> QueriesR15.embAnnIncremental _,
    "lake_cluster_compact"  -> QueriesR15.lakeClusterCompact _,
    // Round-10: Pareto/ABC classification over the distributed prefix sum
    "orders_abc_pareto"     -> QueriesR15.ordersAbcPareto _,
    "events_activity_streaks" -> QueriesR15.eventsActivityStreaks _,
    "lake_ivm_refresh"      -> QueriesR15.lakeIvmRefresh _,
    "events_hll_rolling7"   -> QueriesR15.eventsHllRolling7 _,
    // Round-11: 2-D Z-order read path, SUM/AVG IVM with signed deltas,
    // and the 4:2:0 YCbCr color leg of the JPEG decode family
    "lake_zorder_2d"        -> QueriesR16.lakeZorder2d _,
    "lake_ivm_sumavg"       -> QueriesR16.lakeIvmSumavg _,
    "lake_change_feed_deletes" -> QueriesR16.lakeChangeFeedDeletes _,
    "multimodal_decode_jpeg_color" -> QueriesR16.multimodalDecodeJpegColor _,
    // Round-12: the SQL front door (graft.Sql) proven by oracle, and
    // file-grain k-column Z-order skipping
    "sql_join_revenue"      -> QueriesR17.sqlJoinRevenue _,
    "sql_window_topn"       -> QueriesR17.sqlWindowTopn _,
    "sql_lateral_tokens"    -> QueriesR17.sqlLateralTokens _,
    "lake_zorder_files"     -> QueriesR17.lakeZorderFiles _,
    "multimodal_decode_jpeg_progressive" -> QueriesR17.multimodalDecodeJpegProgressive _,
    "sql_expr_cosine"       -> QueriesR17.sqlExprCosine _,
    "multimodal_audio_fft"  -> QueriesR17.multimodalAudioFft _,
    "multimodal_decode_gif" -> QueriesR17.multimodalDecodeGif _,
    "multimodal_audio_stft" -> QueriesR17.multimodalAudioStft _,
    "graph_bfs_hops"        -> QueriesR17.graphBfsHops _,
    "events_holt_trend"     -> QueriesR17.eventsHoltTrend _,
    "docs_url_normalize"    -> QueriesR17.docsUrlNormalize _,
    "docs_dedup_url"        -> QueriesR17.docsDedupUrl _,
    "docs_dedup_containment" -> QueriesR17.docsDedupContainment _,
    "docs_html_extract"     -> QueriesR17.docsHtmlExtract _,
    // Round-13: the checkpointed commit-log read path, oracle-checked
    "lake_log_checkpoint"   -> QueriesR18.lakeLogCheckpoint _,
    // Round-14: the streaming ingest loop (Ingest.ingestBatch /
    // ingestEmbBatch / knnProbe) under the oracle gate via a
    // deterministic 3-batch replay
    "ingest_docs_replay"    -> QueriesR19.ingestDocsReplay _,
    "ingest_emb_replay"     -> QueriesR19.ingestEmbReplay _,
    "ingest_knn_probe"      -> QueriesR19.ingestKnnProbe _,
    "ingest_docs_replay_maintained" -> QueriesR19.ingestDocsReplayMaintained _,
    // Round-15: audio near-dup by spectral-landmark fingerprinting,
    // video shot-boundary detection over per-frame codec round-trips
    "multimodal_audio_fingerprint" -> QueriesR19.multimodalAudioFingerprint _,
    "multimodal_scene_change" -> QueriesR19.multimodalSceneChange _,
    // Round-15: episodic funnel — batch twin of funnel_ordered_ttl
    "events_funnel_episodes" -> QueriesR19.eventsFunnelEpisodes _,
    // Round-16: TPC-H completion (22/22) — the correlated-subquery
    // decorrelation surface (scalar MIN with joins, nested IN with a
    // correlated scalar SUM, global-fraction HAVING, null-aware NOT IN)
    "q2_min_cost_supp"      -> QueriesR20.q2MinCostSupp _,
    "q11_important_stock"   -> QueriesR20.q11ImportantStock _,
    "q12_latency_priority"  -> QueriesR20.q12LatencyPriority _,
    "q16_supplier_cnt"      -> QueriesR20.q16SupplierCnt _,
    "q20_excess_suppliers"  -> QueriesR20.q20ExcessSuppliers _,
    // Round-16: codebook-refresh maintenance under the oracle gate —
    // batches 0/1 under the frozen batch-0 codebook, a forced
    // retrain + atomic re-cluster, batch 2 under the refreshed cells
    "ingest_emb_refresh"    -> QueriesR20.ingestEmbRefresh _,
    // Round-16: SQL-first surface — a multi-statement session and SQL
    // text over the engine's artifact views (Sql.registerAll)
    "sql_session_multi"     -> QueriesR20.sqlSessionMulti _,
    "sql_neardup_audit"     -> QueriesR20.sqlNeardupAudit _,
    "sql_ingested_stats"    -> QueriesR20.sqlIngestedStats _,
    // Round-16: surgical row-level DML (LakeDml) — copy-on-write
    // DELETE/MERGE at directory granularity, bloom-sidecar point
    // pruning, and GDPR forget-propagation through the ingest tables
    "lake_delete_surgical"  -> QueriesR21.lakeDeleteSurgical _,
    "lake_delete_bloom"     -> QueriesR21.lakeDeleteBloom _,
    "lake_merge_surgical"   -> QueriesR21.lakeMergeSurgical _,
    "ingest_forget"         -> QueriesR21.ingestForget _,
    // Round-16: merge-on-read deletes — equality-delete tombstone
    // files (O(delete list) writes), the readMor subtract view, and
    // the compaction that materializes + clears them atomically
    "lake_delete_mor"       -> QueriesR21.lakeDeleteMor _,
    "lake_delete_mor_compacted" -> QueriesR21.lakeDeleteMorCompacted _,
    "ingest_forget_emb"     -> QueriesR21.ingestForgetEmb _,
    "lake_change_feed_dml"  -> QueriesR21.lakeChangeFeedDml _,
    "lake_update_surgical"  -> QueriesR21.lakeUpdateSurgical _,
    // Round-16: the SQL WRITE surface (LakeSql) — DDL/DML statements
    // as text routed to the transactional lake machinery
    "sql_ctas_insert"       -> QueriesR22.sqlCtasInsert _,
    "sql_delete_where"      -> QueriesR22.sqlDeleteWhere _,
    "sql_update_set"        -> QueriesR22.sqlUpdateSet _,
    "sql_merge_using"       -> QueriesR22.sqlMergeUsing _,
    "sql_time_travel"       -> QueriesR22.sqlTimeTravel _,
    "sql_optimize_vacuum"   -> QueriesR22.sqlOptimizeVacuum _,
    // Round-16: materialized-view rollup rewrite (Mv) — the optimizer
    // answers base-table aggregates from a registered summary
    "mv_rewrite_rollup"     -> QueriesR22.mvRewriteRollup _,
    "mv_rewrite_incremental" -> QueriesR22.mvRewriteIncremental _,
    "sql_create_mv"         -> QueriesR22.sqlCreateMv _,
    "mv_rewrite_timebucket" -> QueriesR22.mvRewriteTimebucket _,
    "mv_rewrite_starjoin"   -> QueriesR22.mvRewriteStarjoin _,
    // Round-17: the r16 verdict gaps — MV filter containment (extra
    // group-column WHERE served from the summary), value-equal date
    // spelling bridges, the predicate-carrying stats-pruned MOR read,
    // and DATE-literal / OR-of-ranges prune derivation in SQL DML
    "mv_rewrite_extra_where" -> QueriesR23.mvRewriteExtraWhere _,
    "mv_rewrite_datebridge" -> QueriesR23.mvRewriteDatebridge _,
    "mv_rewrite_star_incremental" -> QueriesR23.mvRewriteStarIncremental _,
    "mv_rewrite_implied_range" -> QueriesR23.mvRewriteImpliedRange _,
    "lake_mor_pruned"       -> QueriesR23.lakeMorPruned _,
    "sql_delete_dates"      -> QueriesR23.sqlDeleteDates _,
    "sql_delete_timestamps" -> QueriesR23.sqlDeleteTimestamps _,
    "sql_delete_or_ranges"  -> QueriesR23.sqlDeleteOrRanges _,
    // Round-18: the r17 verdict gaps — join-SUBSET MV matching
    // (FK-non-filtering dims dropped, verified at register time) and
    // cross-spelling range implication (CAST(col AS DATE) bounds
    // normalized onto the column's domain at midnight boundaries)
    "mv_rewrite_join_subset" -> QueriesR24.mvRewriteJoinSubset _,
    "mv_rewrite_implied_cast" -> QueriesR24.mvRewriteImpliedCast _,
    "mv_rewrite_avg_int"    -> QueriesR24.mvRewriteAvgInt _,
    "mv_rewrite_count_distinct" -> QueriesR24.mvRewriteCountDistinct _,
    "lake_mor_tombstone_pruned" -> QueriesR24.lakeMorTombstonePruned _,
    // Round-19: the r18 verdict gaps — DECIMAL AVG rollup (exact
    // decimal sums make the average servable, unlike fractional
    // doubles)
    "mv_rewrite_avg_decimal" -> QueriesR25.mvRewriteAvgDecimal _,
    // OR / IN-list filter containment against sliced MV bases
    "mv_rewrite_or_filters" -> QueriesR25.mvRewriteOrFilters _,
    // ANALYZEd lake column statistics feeding CBO filter selectivity
    "lake_cbo_filtered_join" -> QueriesR25.lakeCboFilteredJoin _,
    // LEFT-joined dimension star MVs (nested-form exact matching)
    "mv_rewrite_left_star" -> QueriesR25.mvRewriteLeftStar _,
  )

  val oracleSql: ListMap[String, String] =
    OracleCore.sql ++ OracleRel2.sql ++ OracleEvents.sql ++ OracleFn.sql ++
      OracleDocs.sql ++ OracleExtra.sql ++ OracleDedup.sql ++ OracleR2.sql ++
      OracleR3.sql ++ OracleR4.sql ++ OracleR5.sql ++ OracleR6.sql ++
      OracleR7.sql ++ OracleR8.sql ++ OracleR9.sql ++ OracleR10.sql ++
      OracleR11.sql ++ OracleR12.sql ++ OracleR13.sql ++ OracleR14.sql ++
      OracleR15.sql ++ OracleR16.sql ++ OracleR17.sql ++ OracleR18.sql ++
      OracleR19.sql ++ OracleR20.sql ++ OracleR21.sql ++ OracleR22.sql ++
      OracleR23.sql ++ OracleR24.sql ++ OracleR25.sql
}
