package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventTime, Extended, LlmData, Parity, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching DuckDB SQL in [[oracleSql]]
  * producing a hash-identical result (same column names, same ORDER BY,
  * bit-identical doubles — see graft.Tables for the determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q7MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_ingest_project" -> Parity.p1IngestProject _,
    "p2_dedup_append"   -> Parity.p2DedupAppend _,
    "p3_full_scan"      -> Parity.p3FullScan _,
    "q4_filter_project" -> Relational.q4FilterProject _,
    "q5_hash_agg"       -> Relational.q5HashAgg _,
    "q6_join_agg"       -> Relational.q6JoinAgg _,
    "q7_multi_join"     -> Relational.q7MultiJoin _,
    "q8_anti_join"      -> Relational.q8AntiJoin _,
    "q9_window_topk"    -> Relational.q9WindowTopK _,
    "q10_rollup"        -> Relational.q10Rollup _,
    "q11_distinct_hll"  -> Relational.q11DistinctHll _,
    "q12_sort_limit"    -> Relational.q12SortLimit _,
    "q13_set_ops"       -> Relational.q13SetOps _,
    "q14_scalar_fns"    -> Relational.q14ScalarFns _,
    "q15_tumbling_agg"  -> EventTime.q15TumblingAgg _,
    "q16_sessionize"    -> EventTime.q16Sessionize _,
    "q17_json_extract"  -> EventTime.q17JsonExtract _,
    "q18_semi_join"     -> Extended.q18SemiJoin _,
    "q19_asof_join"     -> Extended.q19AsofJoin _,
    "q20_cube"          -> Extended.q20Cube _,
    "q21_maxby_agg"     -> Extended.q21MaxByAgg _,
    "q22_grouping_sets" -> Extended.q22GroupingSets _,
    "q23_sliding_agg"   -> EventTime.q23SlidingAgg _,
    "q24_interval_join" -> Extended.q24IntervalJoin _,
    "q25_explode"       -> Relational.q25Explode _,
    "q26_window_frames" -> Relational.q26WindowFrames _,
    "q27_pivot"         -> Relational.q27Pivot _,
    "q28_percentiles"   -> Relational.q28Percentiles _,
    "q29_correlated"    -> Relational.q29Correlated _,
    "q30_outer_join"    -> Relational.q30OuterJoin _,
    "q31_map_fns"       -> Relational.q31MapFns _,
    "q32_intersect"     -> Relational.q32Intersect _,
    "q33_histogram"     -> Relational.q33Histogram _,
    "q34_session_window" -> EventTime.q34SessionWindow _,
    "x17_exact_dedup"   -> LlmData.x17ExactDedup _,
    "x18_neardup_jaccard" -> LlmData.x18NearDupJaccard _,
    "x19_cosine_topk"   -> LlmData.x19CosineTopK _,
    "x20_text_stats"    -> LlmData.x20TextStats _,
    "x21_minhash_lsh"   -> LlmData.x21MinhashLsh _,
    "x22_simhash"       -> LlmData.x22Simhash _,
    "x23_ann_srp"       -> LlmData.x23AnnSrp _,
    "x24_lang_id"       -> LlmData.x24LangId _,
    "x25_quality_score" -> LlmData.x25QualityScore _,
    "x26_token_count"   -> LlmData.x26TokenCount _,
    "x27_fingerprint"   -> LlmData.x27Fingerprint _,
    "x28_multimodal_binary" -> LlmData.x28MultimodalBinary _,
    "x29_ngram_jaccard" -> LlmData.x29NgramJaccard _,
    "x30_cosine_neardup" -> LlmData.x30CosineNearDup _,
    "x31_ivf_ann"       -> LlmData.x31IvfAnn _,
    "x32_curation"      -> LlmData.x32Curation _,
    "x33_stratified_sample" -> LlmData.x33StratifiedSample _,
    "x34_repetition"    -> LlmData.x34Repetition _,
    "x35_dedup_clusters" -> LlmData.x35DedupClusters _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "p1_ingest_project" -> Parity.p1Sql,
    "p2_dedup_append"   -> Parity.p2Sql,
    "p3_full_scan"      -> Parity.p3Sql,
    "q4_filter_project" -> Relational.q4Sql,
    "q5_hash_agg"       -> Relational.q5Sql,
    "q6_join_agg"       -> Relational.q6Sql,
    "q7_multi_join"     -> Relational.q7Sql,
    "q8_anti_join"      -> Relational.q8Sql,
    "q9_window_topk"    -> Relational.q9Sql,
    "q10_rollup"        -> Relational.q10Sql,
    "q11_distinct_hll"  -> Relational.q11Sql,
    "q12_sort_limit"    -> Relational.q12Sql,
    "q13_set_ops"       -> Relational.q13Sql,
    "q14_scalar_fns"    -> Relational.q14Sql,
    "q15_tumbling_agg"  -> EventTime.q15Sql,
    "q16_sessionize"    -> EventTime.q16Sql,
    "q17_json_extract"  -> EventTime.q17Sql,
    "q18_semi_join"     -> Extended.q18Sql,
    "q19_asof_join"     -> Extended.q19Sql,
    "q20_cube"          -> Extended.q20Sql,
    "q21_maxby_agg"     -> Extended.q21Sql,
    "q22_grouping_sets" -> Extended.q22Sql,
    "q23_sliding_agg"   -> EventTime.q23Sql,
    "q24_interval_join" -> Extended.q24Sql,
    "q25_explode"       -> Relational.q25Sql,
    "q26_window_frames" -> Relational.q26Sql,
    "q27_pivot"         -> Relational.q27Sql,
    "q28_percentiles"   -> Relational.q28Sql,
    "q29_correlated"    -> Relational.q29Sql,
    "q30_outer_join"    -> Relational.q30Sql,
    "q31_map_fns"       -> Relational.q31Sql,
    "q32_intersect"     -> Relational.q32Sql,
    "q33_histogram"     -> Relational.q33Sql,
    "q34_session_window" -> EventTime.q34Sql,
    "x17_exact_dedup"   -> LlmData.x17Sql,
    "x18_neardup_jaccard" -> LlmData.x18Sql,
    "x19_cosine_topk"   -> LlmData.x19Sql,
    "x20_text_stats"    -> LlmData.x20Sql,
    "x21_minhash_lsh"   -> LlmData.x21Sql,
    "x22_simhash"       -> LlmData.x22Sql,
    "x23_ann_srp"       -> LlmData.x23Sql,
    "x24_lang_id"       -> LlmData.x24Sql,
    "x25_quality_score" -> LlmData.x25Sql,
    "x26_token_count"   -> LlmData.x26Sql,
    "x27_fingerprint"   -> LlmData.x27Sql,
    "x28_multimodal_binary" -> LlmData.x28Sql,
    "x29_ngram_jaccard" -> LlmData.x29Sql,
    "x30_cosine_neardup" -> LlmData.x30Sql,
    "x31_ivf_ann"       -> LlmData.x31Sql,
    "x32_curation"      -> LlmData.x32Sql,
    "x33_stratified_sample" -> LlmData.x33Sql,
    "x34_repetition"    -> LlmData.x34Sql,
    "x35_dedup_clusters" -> LlmData.x35Sql,
  )
}
