package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry is an operator from the SURVEY.md §2 inventory (or
  * a training-data-pipeline op); `oracleSql` gives the DuckDB-equivalent
  * SQL over the same parquet tables. Names/aliases match column-for-column.
  */
object SparkEntry {
  import GraftQueries._

  /** Flagship query on sf=0.001: the reference's README helloworld shape —
    * duration-weighted state distribution per series (traces
    * `distribution()`, timeseries.py:877-937). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    qDistribution(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- core series ops (SURVEY.md §2.2-2.3) ---
    "q01_segments" -> (qSegments _),
    "q02_compact" -> (qCompact _),
    // --- regularize / resample (§2.5) ---
    "q03_sample_prev" -> (qSamplePrev _),
    "q04_sample_linear" -> (qSampleLinear _),
    "q09_moving_average" -> (qMovingAverage _),
    // --- time-weighted aggregation (§2.4, §2.7) ---
    "q05_distribution" -> (qDistribution _),
    "q06_distribution_masked" -> (qDistributionMasked _),
    "q07_twa_mean" -> (qTwaMean _),
    "q08_npoints" -> (qNPoints _),
    // --- rollup tiers + codec (north rule) ---
    "q10_rollup_hourly" -> (qRollupHourly _),
    "q11_rollup_daily" -> (qRollupDaily _),
    "q12_rollup_weekly" -> (qRollupWeekly _),
    "q13_codec_roundtrip" -> (qCodecRoundtrip _),
    // --- merge / multi-series (§2.6) + event series (§2.8) ---
    "q14_merge_sum" -> (qMergeSum _),
    "q15_count_active" -> (qCountActive _),
    "q16_cumsum" -> (qCumsum _),
    "q17_interevent" -> (qInterevent _),
    "q18_events_between" -> (qEventsBetween _),
    "q19_difference" -> (qDifference _),
    // --- training-data pipeline ops ---
    "q20_dedup_exact" -> (qDedupExact _),
    "q21_token_counts" -> (qTokenCounts _),
    "q22_quality" -> (qQuality _),
    "q23_langid" -> (qLangId _),
    "q24_fingerprint" -> (qFingerprint _),
    "q25_minhash_pairs" -> (qMinhashPairs _),
    "q26_simhash" -> (qSimhash _),
    "q27_jaccard" -> (qJaccard _),
    "q28_cosine_topk" -> (qCosineTopK _),
    "q29_ann_ivf" -> (qAnnIvf _),
    "q30_multimodal_meta" -> (qMultimodalMeta _),
    "q60_ann_recall" -> (qAnnRecall _),
    "q61_json_dict_roundtrip" -> (qJsonDictRoundtrip _),
    // --- classic relational smoke ---
    "q31_lineitem_agg" -> (qLineitemAgg _),
    // --- calendar-mask distributions, value-count states, scalar ops ---
    "q32_dist_hour_of_day" -> (qDistHourOfDay _),
    "q33_dist_day_of_week" -> (qDistDayOfWeek _),
    "q34_count_by_value" -> (qCountByValue _),
    "q35_threshold" -> (qThreshold _),
    "q36_quantiles" -> (qQuantiles _),
    // --- round 2: arbitrary-op merge + previously test-only operators ---
    "q37_merge_max" -> (qMergeMax _),
    "q38_sample_interval" -> (qSampleInterval _),
    "q39_logical_ops" -> (qLogicalOps _),
    "q40_hist_stats" -> (qHistStats _),
    "q41_set_interval" -> (qSetInterval _),
    "q42_slice" -> (qSlice _),
    "q43_masked_npoints" -> (qMaskedNPoints _),
    "q44_embedding_neardup" -> (qEmbeddingNearDup _),
    "q45_iter_merge" -> (qIterMerge _),
    "q46_merge_transitions" -> (qMergeTransitions _),
    "q47_distribution_linear" -> (qDistributionLinear _),
    "q48_sliding_intervals" -> (qSlidingIntervals _),
    "q49_navigation" -> (qNavigation _),
    // --- sources round-trips + remaining small-surface ops ---
    "q50_csv_roundtrip" -> (qCsvRoundtrip _),
    "q51_json_roundtrip" -> (qJsonRoundtrip _),
    "q52_remove_point" -> (qRemovePoint _),
    "q53_series_equals" -> (qSeriesEquals _),
    "q54_sample_interval_ffill" -> (qSampleIntervalFfill _),
    "q55_masked_sample" -> (qMaskedSample _),
    "q56_multiply" -> (qMultiply _),
    "q57_remove_interval_not_none" -> (qRemoveIntervalNotNone _),
    "q58_srp_neardup" -> (qSrpNearDup _),
    "q59_sample_interval_idx" -> (qSampleIntervalIdx _),
    "q62_transforms_roundtrip" -> (qTransformsRoundtrip _),
    "q63_state_distribution" -> (qStateDistribution _),
    "q64_state_transitions" -> (qStateTransitions _),
    "q65_state_sample" -> (qStateSample _),
    "q66_dup_clusters" -> (qDupClusters _),
    "q67_dedup_survivors" -> (qDedupSurvivors _),
    "q68_stratified_sample" -> (qStratifiedSample _),
    "q69_pii_redaction" -> (qPiiRedaction _),
    "q70_repetition" -> (qRepetition _),
    "q71_contamination" -> (qContamination _),
    "q72_segment_dedup" -> (qSegmentDedup _),
    "q73_pack_sequences" -> (qPackSequences _),
    "q74_domain_cap" -> (qDomainCap _),
    "q75_url_canon" -> (qUrlCanon _),
    "q76_clf_score" -> (qClassifierScore _),
    "q77_dsir_weights" -> (qDsirWeights _)
  )

  def oracleSql: Map[String, String] = Map(
    "q01_segments" -> sqlSegments,
    "q02_compact" -> sqlCompact,
    "q03_sample_prev" -> sqlSamplePrev,
    "q04_sample_linear" -> sqlSampleLinear,
    "q05_distribution" -> sqlDistribution,
    "q06_distribution_masked" -> sqlDistributionMasked,
    "q07_twa_mean" -> sqlTwaMean,
    "q08_npoints" -> sqlNPoints,
    "q09_moving_average" -> sqlMovingAverage,
    "q10_rollup_hourly" -> sqlRollupHourly,
    "q11_rollup_daily" -> sqlRollupDaily,
    "q12_rollup_weekly" -> sqlRollupWeekly,
    "q13_codec_roundtrip" -> sqlCodecRoundtrip,
    "q14_merge_sum" -> sqlMergeSum,
    "q15_count_active" -> sqlCountActive,
    "q16_cumsum" -> sqlCumsum,
    "q17_interevent" -> sqlInterevent,
    "q18_events_between" -> sqlEventsBetween,
    "q19_difference" -> sqlDifference,
    "q20_dedup_exact" -> sqlDedupExact,
    "q21_token_counts" -> sqlTokenCounts,
    "q22_quality" -> sqlQuality,
    "q23_langid" -> sqlLangId,
    "q24_fingerprint" -> sqlFingerprint,
    "q25_minhash_pairs" -> sqlMinhashPairs,
    "q26_simhash" -> sqlSimhash,
    "q27_jaccard" -> sqlJaccard,
    "q28_cosine_topk" -> sqlCosineTopK,
    "q29_ann_ivf" -> sqlAnnIvf,
    "q30_multimodal_meta" -> sqlMultimodalMeta,
    "q60_ann_recall" -> sqlAnnRecall,
    "q61_json_dict_roundtrip" -> sqlJsonDictRoundtrip,
    "q31_lineitem_agg" -> sqlLineitemAgg,
    "q32_dist_hour_of_day" -> sqlDistHourOfDay,
    "q33_dist_day_of_week" -> sqlDistDayOfWeek,
    "q34_count_by_value" -> sqlCountByValue,
    "q35_threshold" -> sqlThreshold,
    "q36_quantiles" -> sqlQuantiles,
    "q37_merge_max" -> sqlMergeMax,
    "q38_sample_interval" -> sqlSampleInterval,
    "q39_logical_ops" -> sqlLogicalOps,
    "q40_hist_stats" -> sqlHistStats,
    "q41_set_interval" -> sqlSetInterval,
    "q42_slice" -> sqlSlice,
    "q43_masked_npoints" -> sqlMaskedNPoints,
    "q44_embedding_neardup" -> sqlEmbeddingNearDup,
    "q45_iter_merge" -> sqlIterMerge,
    "q46_merge_transitions" -> sqlMergeTransitions,
    "q47_distribution_linear" -> sqlDistributionLinear,
    "q48_sliding_intervals" -> sqlSlidingIntervals,
    "q49_navigation" -> sqlNavigation,
    "q50_csv_roundtrip" -> sqlCsvRoundtrip,
    "q51_json_roundtrip" -> sqlJsonRoundtrip,
    "q52_remove_point" -> sqlRemovePoint,
    "q53_series_equals" -> sqlSeriesEquals,
    "q54_sample_interval_ffill" -> sqlSampleIntervalFfill,
    "q55_masked_sample" -> sqlMaskedSample,
    "q56_multiply" -> sqlMultiply,
    "q57_remove_interval_not_none" -> sqlRemoveIntervalNotNone,
    "q58_srp_neardup" -> sqlSrpNearDup,
    "q59_sample_interval_idx" -> sqlSampleIntervalIdx,
    "q62_transforms_roundtrip" -> sqlTransformsRoundtrip,
    "q63_state_distribution" -> sqlStateDistribution,
    "q64_state_transitions" -> sqlStateTransitions,
    "q65_state_sample" -> sqlStateSample,
    "q66_dup_clusters" -> sqlDupClusters,
    "q67_dedup_survivors" -> sqlDedupSurvivors,
    "q68_stratified_sample" -> sqlStratifiedSample,
    "q69_pii_redaction" -> sqlPiiRedaction,
    "q70_repetition" -> sqlRepetition,
    "q71_contamination" -> sqlContamination,
    "q72_segment_dedup" -> sqlSegmentDedup,
    "q73_pack_sequences" -> sqlPackSequences,
    "q74_domain_cap" -> sqlDomainCap,
    "q75_url_canon" -> sqlUrlCanon,
    "q76_clf_score" -> sqlClassifierScore,
    "q77_dsir_weights" -> sqlDsirWeights
  )
}
