"""The query registry: every operator the engine claims, paired with its
DuckDB oracle SQL (or None for non-SQL-expressible ops → driver records
the weaker rows-only check).  ``__spark_entry__.py`` is a thin view over
this.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from df_to_azure_spark.plans import analytics as A
from df_to_azure_spark.plans import analytics2 as A2
from df_to_azure_spark.plans import analytics3 as A3
from df_to_azure_spark.plans import analytics4 as A4
from df_to_azure_spark.plans import analytics5 as A5
from df_to_azure_spark.plans import parity as P
from df_to_azure_spark.plans import pipeline as PL
from df_to_azure_spark.plans import pipeline2 as PL2
from df_to_azure_spark.plans import pipeline3 as PL3
from df_to_azure_spark.plans import pipeline4 as PL4
from df_to_azure_spark.plans import pipeline5 as PL5
from df_to_azure_spark.plans import pipeline6 as PL6
from df_to_azure_spark.plans import pipeline7 as PL7
from df_to_azure_spark.plans import pipeline8 as PL8
from df_to_azure_spark.plans import pipeline9 as PL9
from df_to_azure_spark.plans import pipeline10 as PL10
from df_to_azure_spark.plans import training_data as TD


def _stream_hh_superset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import (
        stream_heavy_hitter_superset_diff,
    )

    return stream_heavy_hitter_superset_diff(spark, sf_dir)


def _stream_contamination_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_contamination_diff

    return stream_contamination_diff(spark, sf_dir)


def _stream_contamination_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import (
        STREAM_CONTAMINATION_ORACLE,
    )

    return STREAM_CONTAMINATION_ORACLE


def _stream_hh_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import STREAM_HH_SUPERSET_ORACLE

    return STREAM_HH_SUPERSET_ORACLE


def _stream_qhist_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_quantile_hist_diff

    return stream_quantile_hist_diff(spark, sf_dir)


def _stream_qhist_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import STREAM_QHIST_DIFF_ORACLE

    return STREAM_QHIST_DIFF_ORACLE


def _stream_windowed_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_vs_batch_windowed_diff

    return stream_vs_batch_windowed_diff(spark, sf_dir)


def _stream_diff_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_DIFF_ORACLE

    return STREAM_DIFF_ORACLE


def _stream_attribution_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_attribution_diff

    return stream_attribution_diff(spark, sf_dir)


def _stream_attr_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_ATTR_ORACLE

    return STREAM_ATTR_ORACLE


def _stream_attribution_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_attribution_outer_diff

    return stream_attribution_outer_diff(spark, sf_dir)


def _stream_attr_outer_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_ATTR_OUTER_ORACLE

    return STREAM_ATTR_OUTER_ORACLE


def _stream_attribution_right_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_attribution_right_diff

    return stream_attribution_right_diff(spark, sf_dir)


def _stream_attr_right_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_ATTR_RIGHT_ORACLE

    return STREAM_ATTR_RIGHT_ORACLE


def _stream_attribution_full_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_attribution_full_diff

    return stream_attribution_full_diff(spark, sf_dir)


def _stream_attr_full_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_ATTR_FULL_ORACLE

    return STREAM_ATTR_FULL_ORACLE


def _stream_static_join_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_static_join_diff

    return stream_static_join_diff(spark, sf_dir)


def _stream_static_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_STATIC_ORACLE

    return STREAM_STATIC_ORACLE


def _stream_interval_join_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_interval_join_diff

    return stream_interval_join_diff(spark, sf_dir)


def _stream_interval_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_INTERVAL_ORACLE

    return STREAM_INTERVAL_ORACLE


def _stream_sliding_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_sliding_counts_diff

    return stream_sliding_counts_diff(spark, sf_dir)


def _stream_sliding_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_SLIDING_ORACLE

    return STREAM_SLIDING_ORACLE


def _stream_builtin_session_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_builtin_session_diff

    return stream_builtin_session_diff(spark, sf_dir)


def _stream_builtin_session_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_BUILTIN_SESSION_ORACLE

    return STREAM_BUILTIN_SESSION_ORACLE


def _stream_concurrency_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_concurrency_diff

    return stream_concurrency_diff(spark, sf_dir)


def _stream_concurrency_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import CONCURRENCY_DIFF_ORACLE

    return CONCURRENCY_DIFF_ORACLE


def _stream_cms_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_cms_diff

    return stream_cms_diff(spark, sf_dir)


def _stream_cms_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import STREAM_CMS_DIFF_ORACLE

    return STREAM_CMS_DIFF_ORACLE


def _stream_hll_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_hll_diff

    return stream_hll_diff(spark, sf_dir)


def _stream_hll_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import STREAM_HLL_DIFF_ORACLE

    return STREAM_HLL_DIFF_ORACLE


def _stream_sessionize_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_sessionize_diff

    return stream_sessionize_diff(spark, sf_dir)


def _stream_sessionize_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import SESSIONIZE_DIFF_ORACLE

    return SESSIONIZE_DIFF_ORACLE


def _stream_dedup_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.events import stream_dedup_diff

    return stream_dedup_diff(spark, sf_dir)


def _stream_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.cdc_source import stream_cdc_vs_batch_diff

    return stream_cdc_vs_batch_diff(spark, sf_dir)


def _stream_cdc_oracle() -> str:
    from df_to_azure_spark.streaming.cdc_source import STREAM_CDC_DIFF_ORACLE

    return STREAM_CDC_DIFF_ORACLE


def _stream_cdc_rewrite_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.cdc_source import stream_cdc_rewrite_diff

    return stream_cdc_rewrite_diff(spark, sf_dir)


def _stream_cdc_rewrite_oracle() -> str:
    from df_to_azure_spark.streaming.cdc_source import (
        STREAM_CDC_REWRITE_DIFF_ORACLE,
    )

    return STREAM_CDC_REWRITE_DIFF_ORACLE


def _stream_dedup_oracle() -> str:
    from df_to_azure_spark.streaming.events import STREAM_DEDUP_ORACLE

    return STREAM_DEDUP_ORACLE


def _stream_totals_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from df_to_azure_spark.streaming.stateful import stream_vs_batch_totals_diff

    return stream_vs_batch_totals_diff(spark, sf_dir)


def _totals_diff_oracle() -> str:
    from df_to_azure_spark.streaming.stateful import TOTALS_DIFF_ORACLE

    return TOTALS_DIFF_ORACLE


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, QuerySpec] = {
    # --- reference parity (SURVEY §2.3-2.5) ---
    "w1_create_typed": QuerySpec(P.w1_create_typed, P.W1_ORACLE),
    "w2_append_union": QuerySpec(P.w2_append_union, P.W2_ORACLE),
    "w4_upsert_lake": QuerySpec(P.w4_upsert_lake, P.W4_ORACLE, headline=True),
    # transactional lake (round 11): full VersionedLake lifecycle —
    # create → OCC upsert → batch-marked append + idempotent retry →
    # vacuum → read — certified against the pure row algebra
    "w5_versioned_lake_roundtrip": QuerySpec(
        P.w5_versioned_lake_roundtrip, P.W5_VERSIONED_ORACLE
    ),
    # time-travel CDC between two committed manifest versions
    "w6_lake_version_diff": QuerySpec(
        P.w6_lake_version_diff, P.W6_VERSION_DIFF_ORACLE
    ),
    # zone-map file pruning (round 12): scan() plans over only the
    # manifest files whose per-file min/max admit the predicate; the
    # entry raises if no file was skipped
    "w7_pruned_scan": QuerySpec(
        P.w7_pruned_scan, P.W7_PRUNED_SCAN_ORACLE, headline=True
    ),
    # RESTORE (round 12): roll back to a version by republishing its
    # file list — read must equal the untouched source bit-for-bit
    "w8_table_restore": QuerySpec(P.w8_table_restore, P.W8_RESTORE_ORACLE),
    # manifest-derived change feed (round 12): IO proportional to the
    # changed files; exact row CDC on append-only history
    "w9_incremental_changes": QuerySpec(
        P.w9_incremental_changes, P.W9_CHANGES_ORACLE
    ),
    # declared dictionary stats (round 12): equality pruning on an
    # unclustered enum column where min/max provably cannot skip;
    # raises in-entry if the dictionary probe reads any file
    "w10_dict_pruned_scan": QuerySpec(
        P.w10_dict_pruned_scan, P.W10_DICT_SCAN_ORACLE
    ),
    # null-predicate + OR pruning (round 13): is_null opens only files
    # with recorded nulls, an or-of-conjunctions opens the union of the
    # branches' keeps; raises in-entry on a pruning regression
    "w11_null_or_pruned_scan": QuerySpec(
        P.w11_null_or_pruned_scan, P.W11_NULL_SCAN_ORACLE
    ),
    # truncated-prefix string bounds (round 13): long document text
    # gets Delta-style widened 64-char zone maps; a prefix-range probe
    # on the text-sorted table must skip files (asserted in-entry)
    "w12_text_pruned_scan": QuerySpec(
        P.w12_text_pruned_scan, P.W12_TEXT_SCAN_ORACLE
    ),
    # columnar-checkpoint scan (round 13): the chain resolves through
    # the parquet sidecar and pruning runs as Arrow kernels; raises
    # in-entry if the sidecar root or the skipping regressed
    "w13_ckpt_scan": QuerySpec(
        P.w13_ckpt_scan, P.W13_CKPT_SCAN_ORACLE, headline=True
    ),
    # starts_with prefix pruning (round 13) on the text-sorted
    # documents table; raises in-entry if the prefix probe stops
    # skipping files
    "w14_prefix_scan": QuerySpec(P.w14_prefix_scan, P.W14_PREFIX_SCAN_ORACLE),
    # predicate-scoped DELETE (round 14): the pruning keep-set bounds
    # the rewrite — interior all-match files drop with no IO, boundary
    # files rewrite, the rest carry verbatim; raises in-entry on any
    # rewrite-bounding or carried-file regression
    "w15_delete_scan": QuerySpec(
        P.w15_delete_scan, P.W15_DELETE_SCAN_ORACLE, headline=True
    ),
    # row-level keyed MERGE on an unpartitioned table (round 14): only
    # files intersecting the delta's key envelope rewrite; raises
    # in-entry if envelope pruning or the carried-file contract regress
    "w16_merge_keyed": QuerySpec(P.w16_merge_keyed, P.W16_MERGE_KEYED_ORACLE),
    # decimal zone maps (round 14): numeric(18,2) bounds encode as
    # unscaled ints; a decimal range scan on a price-clustered table
    # must skip files (asserted in-entry)
    "w17_decimal_scan": QuerySpec(
        P.w17_decimal_scan, P.W17_DECIMAL_SCAN_ORACLE
    ),
    # per-file bloom indexes (round 14): an unclustered point lookup
    # opens <= 2 of 8 files while zone maps alone keep all (both
    # counts asserted in-entry)
    "w18_bloom_probe": QuerySpec(
        P.w18_bloom_probe, P.W18_BLOOM_PROBE_ORACLE, headline=True
    ),
    "w4_upsert_cell_level": QuerySpec(P.w4_upsert_cell_level, P.W4_CELL_ORACLE),
    "w3_merge_update_only": QuerySpec(P.w3_merge_update_only, P.W3_UPDATE_ONLY_ORACLE),
    "w3_merge_insert_only": QuerySpec(P.w3_merge_insert_only, P.W3_INSERT_ONLY_ORACLE),
    "widening_scan": QuerySpec(P.widening_scan, P.WIDENING_ORACLE),
    "duplicate_key_probe": QuerySpec(P.duplicate_key_probe, P.DUP_KEY_ORACLE),
    "profile_customer": QuerySpec(P.profile_customer, P.PROFILE_ORACLE),
    "scd2_customers": QuerySpec(P.scd2_customers, P.SCD2_ORACLE),
    "orders_version_diff": QuerySpec(P.orders_version_diff, P.VERSION_DIFF_ORACLE),
    # --- analytics (SURVEY §2.7 Spark-native surface) ---
    "q1_pricing_summary": QuerySpec(A.q1_pricing_summary, A.Q1_ORACLE, headline=True),
    "q3_shipping_priority": QuerySpec(A.q3_shipping_priority, A.Q3_ORACLE, headline=True),
    "q5_local_supplier_volume": QuerySpec(A.q5_local_supplier_volume, A.Q5_ORACLE, headline=True),
    "q6_revenue_forecast": QuerySpec(A.q6_revenue_forecast, A.Q6_ORACLE, headline=True),
    "top3_parts_per_brand": QuerySpec(A.top3_parts_per_brand, A.TOP3_ORACLE),
    "rollup_order_totals": QuerySpec(A.rollup_order_totals, A.ROLLUP_ORACLE),
    "customers_without_orders": QuerySpec(A.customers_without_orders, A.NO_ORDERS_ORACLE),
    "urgent_customers_by_segment": QuerySpec(
        A.urgent_customers_by_segment, A.URGENT_SEGMENT_ORACLE
    ),
    "running_customer_revenue": QuerySpec(
        A.running_customer_revenue, A.RUNNING_ORACLE, headline=True
    ),
    "events_hourly": QuerySpec(A.events_hourly, A.EVENTS_HOURLY_ORACLE, headline=True),
    "sessionize_events": QuerySpec(A.sessionize_events, A.SESSIONIZE_ORACLE, headline=True),
    "session_window_events": QuerySpec(
        A.session_window_events, A.SESSION_WINDOW_ORACLE
    ),
    # --- training-data operators ---
    "doc_stats": QuerySpec(TD.doc_stats, TD.DOC_STATS_ORACLE),
    "doc_quality": QuerySpec(TD.doc_quality, TD.DOC_QUALITY_ORACLE),
    "doc_language_id": QuerySpec(TD.doc_language_id, TD.DOC_LANG_ORACLE),
    "exact_dedup_groups": QuerySpec(TD.exact_dedup_groups, TD.EXACT_DEDUP_ORACLE, headline=True),
    "exact_dedup_table": QuerySpec(TD.exact_dedup_table, TD.EXACT_DEDUP_TABLE_ORACLE),
    "knn_topk": QuerySpec(TD.knn_topk, TD.KNN_ORACLE, headline=True),
    "doc_hash_embedding": QuerySpec(TD.doc_hash_embedding, TD.HASH_EMBEDDING_ORACLE),
    "hashed_doc_knn": QuerySpec(TD.hashed_doc_knn, TD.HASHED_KNN_ORACLE),
    "embedding_neardup_pairs": QuerySpec(TD.embedding_neardup_pairs, TD.NEARDUP_ORACLE),
    "embedding_neardup_pairs_lsh": QuerySpec(
        TD.embedding_neardup_pairs_lsh, TD.NEARDUP_LSH_ORACLE
    ),
    "ivf_knn": QuerySpec(TD.ivf_knn, TD.IVF_KNN_ORACLE),
    # graph-index ANN family (round 11): deterministic NN-descent k-NN
    # graph build over IVF-cell ring seeds + its exact-recall audit
    "nn_descent_knn_graph": QuerySpec(
        TD.nn_descent_knn_graph, TD.NN_DESCENT_ORACLE, headline=True
    ),
    # graph-ANN search (round 12): beam search walking the NN-descent
    # graph — oracle replays build + unrolled hops bit-for-bit
    "nn_descent_search_knn": QuerySpec(
        TD.nn_descent_search_knn, TD.NN_DESCENT_SEARCH_ORACLE, headline=True
    ),
    "nn_descent_search_recall": QuerySpec(
        TD.nn_descent_search_recall, TD.NN_DESCENT_SEARCH_RECALL_ORACLE
    ),
    "nn_descent_recall_check": QuerySpec(
        TD.nn_descent_recall_check, TD.NN_DESCENT_RECALL_ORACLE
    ),
    "pq_adc_knn": QuerySpec(TD.pq_adc_knn, TD.PQ_ADC_ORACLE),
    "pq_rerank_knn": QuerySpec(TD.pq_rerank_knn, TD.PQ_RERANK_ORACLE),
    "sq8_rerank_knn": QuerySpec(TD.sq8_rerank_knn, TD.SQ8_RERANK_ORACLE),
    "rp_rerank_knn": QuerySpec(TD.rp_rerank_knn, TD.RP_RERANK_ORACLE),
    "sq8_recall_check": QuerySpec(TD.sq8_recall_check, TD.SQ8_RECALL_ORACLE),
    "ivf_sq8_knn": QuerySpec(TD.ivf_sq8_knn, TD.IVF_SQ8_ORACLE, headline=True),
    "mmr_rerank_knn": QuerySpec(
        TD.mmr_rerank_knn, TD.MMR_RERANK_ORACLE, headline=True
    ),
    "hybrid_rrf_knn": QuerySpec(TD.hybrid_rrf_knn, TD.HYBRID_RRF_ORACLE),
    "hybrid_lexical_dense": QuerySpec(
        TD.hybrid_lexical_dense, TD.HYBRID_LEXICAL_DENSE_ORACLE
    ),
    "hybrid_weighted_rrf": QuerySpec(
        TD.hybrid_weighted_rrf, TD.HYBRID_WEIGHTED_RRF_ORACLE
    ),
    "pq_code_invariant": QuerySpec(TD.pq_code_invariant, TD.PQ_INVARIANT_ORACLE),
    "pq_trained_codebooks": QuerySpec(
        TD.pq_trained_codebooks, TD.PQ_TRAINED_ORACLE
    ),
    "pq_trained_recall_check": QuerySpec(
        TD.pq_trained_recall_check, TD.PQ_TRAINED_RECALL_ORACLE
    ),
    "ivf_trained_knn": QuerySpec(TD.ivf_trained_knn, TD.IVF_TRAINED_ORACLE),
    "dedup_cluster_representatives": QuerySpec(
        TD.dedup_cluster_representatives, TD.CLUSTER_REPS_ORACLE
    ),
    "doc_length_weighted_sample": QuerySpec(
        TD.doc_length_weighted_sample, TD.WEIGHTED_SAMPLE_ORACLE
    ),
    "neardup_components": QuerySpec(
        TD.neardup_components, TD.NEARDUP_COMPONENTS_ORACLE, headline=True
    ),
    "vocab_top_terms": QuerySpec(PL.vocab_top_terms, PL.VOCAB_ORACLE),
    "doc_repetition_stats": QuerySpec(
        PL.doc_repetition_stats, PL.REPETITION_ORACLE
    ),
    "doc_redaction_stats": QuerySpec(
        PL.doc_redaction_stats, PL.REDACTION_ORACLE
    ),
    "training_mix": QuerySpec(PL.training_mix, PL.TRAINING_MIX_ORACLE, headline=True),
    "approx_stats_error_check": QuerySpec(
        PL.approx_stats_error_check, PL.APPROX_CHECK_ORACLE
    ),
    "simhash_invariant_check": QuerySpec(
        PL.simhash_invariant_check, PL.SIMHASH_CHECK_ORACLE
    ),
    "minhash_error_check": QuerySpec(
        PL.minhash_error_check, PL.MINHASH_CHECK_ORACLE
    ),
    "doc_chunks": QuerySpec(PL.doc_chunks, PL.DOC_CHUNKS_ORACLE),
    "doc_sample_10pct": QuerySpec(PL.doc_sample_10pct, PL.DOC_SAMPLE_ORACLE),
    "doc_stratified_sample": QuerySpec(
        PL.doc_stratified_sample, PL.STRATIFIED_SAMPLE_ORACLE
    ),
    "user_value_outliers": QuerySpec(PL.user_value_outliers, PL.OUTLIERS_ORACLE),
    "doc_packing": QuerySpec(PL.doc_packing, PL.DOC_PACKING_ORACLE),
    "doc_commonness": QuerySpec(PL.doc_commonness, PL.DOC_COMMONNESS_ORACLE),
    "embedding_quantization_check": QuerySpec(
        PL.embedding_quantization_check, PL.QUANTIZATION_CHECK_ORACLE
    ),
    "split_contamination": QuerySpec(
        PL.split_contamination, PL.SPLIT_CONTAMINATION_ORACLE
    ),
    "part_cooccurrence": QuerySpec(PL.part_cooccurrence, PL.PART_COOCCURRENCE_ORACLE),
    "doc_tfidf_terms": QuerySpec(PL.doc_tfidf_terms, PL.DOC_TFIDF_ORACLE),
    "doc_winnowing_fingerprints": QuerySpec(
        PL.doc_winnowing_fingerprints, PL.DOC_WINNOWING_ORACLE
    ),
    "winnow_neardup_pairs": QuerySpec(
        PL.winnow_neardup_pairs, PL.WINNOW_PAIRS_ORACLE, headline=True
    ),
    "bigram_collocations": QuerySpec(
        PL.bigram_collocations, PL.BIGRAM_COLLOCATIONS_ORACLE
    ),
    "kmeans_step": QuerySpec(PL.kmeans_step, PL.KMEANS_STEP_ORACLE),
    "label_prototype_confusion": QuerySpec(
        PL.label_prototype_confusion, PL.LABEL_CONFUSION_ORACLE
    ),
    "split_neardup_contamination": QuerySpec(
        PL.split_neardup_contamination, PL.SPLIT_NEARDUP_ORACLE
    ),
    "neardup_degree_histogram": QuerySpec(
        PL.neardup_degree_histogram, PL.DEGREE_HISTOGRAM_ORACLE
    ),
    "gopher_quality_filter": QuerySpec(
        PL.gopher_quality_filter, PL.GOPHER_ORACLE
    ),
    "doc_bigram_surprisal": QuerySpec(
        PL.doc_bigram_surprisal, PL.BIGRAM_SURPRISAL_ORACLE
    ),
    "doc_trigram_surprisal": QuerySpec(
        PL.doc_trigram_surprisal, PL.TRIGRAM_SURPRISAL_ORACLE
    ),
    "weighted_doc_sample": QuerySpec(
        PL.weighted_doc_sample, PL.WEIGHTED_SAMPLE_ORACLE
    ),
    "source_weighted_sample": QuerySpec(
        PL.source_weighted_sample, PL.SOURCE_WEIGHTED_SAMPLE_ORACLE
    ),
    "zipf_fit": QuerySpec(PL.zipf_fit, PL.ZIPF_FIT_ORACLE),
    "source_js_divergence": QuerySpec(
        PL.source_js_divergence, PL.SOURCE_JSD_ORACLE
    ),
    "doc_unigram_surprisal": QuerySpec(
        PL.doc_unigram_surprisal, PL.UNIGRAM_SURPRISAL_ORACLE
    ),
    "source_overlap_matrix": QuerySpec(
        PL.source_overlap_matrix, PL.SOURCE_OVERLAP_ORACLE
    ),
    "doc_sample_k_per_lang": QuerySpec(
        PL.doc_sample_k_per_lang, PL.DOC_SAMPLE_K_ORACLE
    ),
    # --- analytics wave 2 ---
    "pivot_status_by_priority": QuerySpec(A2.pivot_status_by_priority, A2.PIVOT_ORACLE),
    "cube_part_stats": QuerySpec(A2.cube_part_stats, A2.CUBE_ORACLE),
    "grouping_sets_orders": QuerySpec(A2.grouping_sets_orders, A2.GROUPING_SETS_ORACLE),
    "distinct_customers_per_status": QuerySpec(
        A2.distinct_customers_per_status, A2.DISTINCT_ORACLE
    ),
    "building_and_urgent_customers": QuerySpec(
        A2.building_and_urgent_customers, A2.INTERSECT_ORACLE
    ),
    "price_band_counts": QuerySpec(A2.price_band_counts, A2.PRICE_BAND_ORACLE),
    "purchases_asof_view": QuerySpec(A2.purchases_asof_view, A2.ASOF_ORACLE, headline=True),
    "events_value_delta": QuerySpec(A2.events_value_delta, A2.VALUE_DELTA_ORACLE),
    "latest_event_per_user": QuerySpec(A2.latest_event_per_user, A2.LATEST_EVENT_ORACLE),
    "unpivot_order_measures": QuerySpec(A2.unpivot_order_measures, A2.UNPIVOT_ORACLE),
    "building_never_urgent": QuerySpec(A2.building_never_urgent, A2.EXCEPT_ORACLE),
    "order_price_quartiles": QuerySpec(A2.order_price_quartiles, A2.QUARTILES_ORACLE),
    "quantity_rank_profile": QuerySpec(
        A2.quantity_rank_profile, A2.QUANTITY_RANK_ORACLE
    ),
    "supplier_name_normalize": QuerySpec(
        A2.supplier_name_normalize, A2.NAME_NORMALIZE_ORACLE
    ),
    "events_json_props": QuerySpec(A2.events_json_props, A2.EVENTS_JSON_ORACLE),
    "events_rolling_hour": QuerySpec(A2.events_rolling_hour, A2.ROLLING_HOUR_ORACLE),
    "events_value_histogram": QuerySpec(
        A2.events_value_histogram, A2.VALUE_HISTOGRAM_ORACLE
    ),
    "order_price_dispersion": QuerySpec(
        A2.order_price_dispersion, A2.DISPERSION_ORACLE
    ),
    "funnel_view_to_purchase": QuerySpec(
        A2.funnel_view_to_purchase, A2.FUNNEL_ORACLE
    ),
    # --- analytics wave 3 (remaining TPC-H shapes) ---
    "q4_late_shipping": QuerySpec(A3.q4_late_shipping, A3.Q4_ORACLE),
    "q12_returnflag_priority": QuerySpec(A3.q12_returnflag_priority, A3.Q12_ORACLE),
    "q13_order_count_distribution": QuerySpec(
        A3.q13_order_count_distribution, A3.Q13_ORACLE
    ),
    "q14_promo_revenue_share": QuerySpec(A3.q14_promo_revenue_share, A3.Q14_ORACLE),
    "q15_top_supplier": QuerySpec(A3.q15_top_supplier, A3.Q15_ORACLE),
    "q18_large_volume_orders": QuerySpec(A3.q18_large_volume_orders, A3.Q18_ORACLE),
    "q19_disjunctive_revenue": QuerySpec(A3.q19_disjunctive_revenue, A3.Q19_ORACLE),
    "q17_small_quantity_revenue": QuerySpec(
        A3.q17_small_quantity_revenue, A3.Q17_ORACLE
    ),
    "q22_idle_balances": QuerySpec(A3.q22_idle_balances, A3.Q22_ORACLE),
    "q21_waiting_suppliers": QuerySpec(A3.q21_waiting_suppliers, A3.Q21_ORACLE),
    "fk_orphan_check": QuerySpec(A3.fk_orphan_check, A3.FK_ORPHAN_ORACLE),
    "salted_join_revenue": QuerySpec(A3.salted_join_revenue, A3.SALTED_JOIN_ORACLE),
    "customers_outside_asia": QuerySpec(A3.customers_outside_asia, A3.NOT_IN_ORACLE),
    "order_price_median": QuerySpec(A3.order_price_median, A3.MEDIAN_ORACLE),
    "nation_account_full_outer": QuerySpec(
        A3.nation_account_full_outer, A3.FULL_OUTER_ORACLE
    ),
    # --- analytics wave 4 (role-played dims + partsupp-family shapes) ---
    "q7_nation_trade": QuerySpec(A4.q7_nation_trade, A4.Q7_ORACLE),
    "q8_market_share": QuerySpec(A4.q8_market_share, A4.Q8_ORACLE),
    "q9_product_profit": QuerySpec(A4.q9_product_profit, A4.Q9_ORACLE, headline=True),
    "q10_returned_revenue": QuerySpec(A4.q10_returned_revenue, A4.Q10_ORACLE),
    "q2_min_price_supplier": QuerySpec(A4.q2_min_price_supplier, A4.Q2_ORACLE),
    "q11_important_parts": QuerySpec(A4.q11_important_parts, A4.Q11_ORACLE),
    "q16_supplier_counts": QuerySpec(A4.q16_supplier_counts, A4.Q16_ORACLE),
    "q20_dominant_suppliers": QuerySpec(A4.q20_dominant_suppliers, A4.Q20_ORACLE),
    "events_hourly_gapfill": QuerySpec(
        A4.events_hourly_gapfill, A4.GAPFILL_ORACLE
    ),
    "events_value_ffill": QuerySpec(A4.events_value_ffill, A4.FFILL_ORACLE),
    # date_trunc('week') variant — the engine-convention path (both
    # engines start weeks on Monday); A5's integer-week twin below keeps
    # the convention-free formulation.  Was silently shadowed by the A5
    # entry (duplicate dict key) until round 7.
    "user_retention_cohorts_trunc": QuerySpec(
        A4.user_retention_cohorts, A4.RETENTION_ORACLE
    ),
    "events_time_weighted_avg": QuerySpec(
        A4.events_time_weighted_avg, A4.TWA_ORACLE
    ),
    "user_event_transitions": QuerySpec(
        A4.user_event_transitions, A4.TRANSITIONS_ORACLE
    ),
    "user_event_pattern": QuerySpec(
        A4.user_event_pattern, A4.EVENT_PATTERN_ORACLE
    ),
    "order_price_equidepth": QuerySpec(
        A4.order_price_equidepth, A4.EQUIDEPTH_ORACLE
    ),
    "funnel_conversion_latency": QuerySpec(
        A4.funnel_conversion_latency, A4.FUNNEL_LATENCY_ORACLE
    ),
    "customer_fuzzy_name_pairs": QuerySpec(
        A4.customer_fuzzy_name_pairs, A4.FUZZY_NAME_ORACLE
    ),
    "winsorized_event_stats": QuerySpec(
        A4.winsorized_event_stats, A4.WINSORIZED_ORACLE
    ),
    # --- statistics wave (exact sufficient statistics → one final float) ---
    "nation_revenue_trend": QuerySpec(
        A5.nation_revenue_trend, A5.NATION_TREND_ORACLE
    ),
    "user_event_entropy": QuerySpec(
        A5.user_event_entropy, A5.USER_ENTROPY_ORACLE
    ),
    "priority_status_chi2": QuerySpec(
        A5.priority_status_chi2, A5.CHI2_ORACLE
    ),
    "bootstrap_order_price_means": QuerySpec(
        A5.bootstrap_order_price_means, A5.BOOTSTRAP_ORACLE
    ),
    "event_mad_outliers": QuerySpec(
        A5.event_mad_outliers, A5.MAD_OUTLIERS_ORACLE
    ),
    "quantity_price_correlation": QuerySpec(
        A5.quantity_price_correlation, A5.QTY_PRICE_CORR_ORACLE
    ),
    "user_retention_cohorts": QuerySpec(
        A5.user_retention_cohorts, A5.RETENTION_COHORTS_ORACLE
    ),
    "event_funnel_conversion": QuerySpec(
        A5.event_funnel_conversion, A5.FUNNEL_ORACLE
    ),
    "event_transition_matrix": QuerySpec(
        A5.event_transition_matrix, A5.TRANSITION_MATRIX_ORACLE
    ),
    "join_key_skew_profile": QuerySpec(
        A5.join_key_skew_profile, A5.SKEW_PROFILE_ORACLE
    ),
    # --- training-data wave 2 ---
    "doc_shared_spans": QuerySpec(
        TD.doc_shared_spans, TD.SHARED_SPANS_ORACLE, headline=True
    ),
    "doc_span_dedup": QuerySpec(TD.doc_span_dedup, TD.SPAN_DEDUP_ORACLE),
    "suffix_dup_spans": QuerySpec(
        TD.suffix_dup_spans, TD.SUFFIX_DUP_SPANS_ORACLE, headline=True
    ),
    "suffix_dup_profile": QuerySpec(
        TD.suffix_dup_profile, TD.SUFFIX_DUP_PROFILE_ORACLE
    ),
    "token_budget_mix": QuerySpec(TD.token_budget_mix, TD.TOKEN_BUDGET_ORACLE),
    "ngram_jaccard_pairs": QuerySpec(TD.ngram_jaccard, TD.NGRAM_JACCARD_ORACLE),
    "ngram_containment_pairs": QuerySpec(
        TD.ngram_containment, TD.NGRAM_CONTAINMENT_ORACLE
    ),
    "doc_token_bpe": QuerySpec(TD.doc_token_bpe, TD.DOC_TOKEN_BPE_ORACLE),
    "doc_split_counts": QuerySpec(TD.doc_split_counts, TD.DOC_SPLIT_ORACLE),
    "incremental_orders_rollup": QuerySpec(
        TD.incremental_orders_rollup, TD.INCREMENTAL_ORACLE
    ),
    "minhash_lsh_pairs": QuerySpec(
        TD.minhash_pairs, TD.MINHASH_PAIRS_ORACLE, headline=True
    ),
    "incremental_neardup_pairs": QuerySpec(
        TD.incremental_neardup_pairs, TD.MINHASH_BETWEEN_ORACLE
    ),
    "lsh_knn": QuerySpec(TD.lsh_knn, TD.LSH_KNN_ORACLE),
    "lsh_knn_multiprobe": QuerySpec(
        TD.lsh_knn_multiprobe, TD.LSH_MULTIPROBE_ORACLE
    ),
    "simhash_fingerprints": QuerySpec(TD.simhash_fingerprints, TD.SIMHASH_ORACLE),
    "simhash_neardup_pairs": QuerySpec(
        TD.simhash_neardup_pairs, TD.SIMHASH_PAIRS_ORACLE
    ),
    # --- training-data wave 3 (semantic dedup, data selection, graph) ---
    "semdedup_prune": QuerySpec(PL2.semdedup_prune, PL2.SEMDEDUP_ORACLE),
    "part_pagerank": QuerySpec(
        PL2.part_pagerank, PL2.PART_PAGERANK_ORACLE, headline=True
    ),
    "dsir_importance_weights": QuerySpec(
        PL2.dsir_importance_weights, PL2.DSIR_ORACLE, headline=True
    ),
    "doc_classifier_scores": QuerySpec(
        PL2.doc_classifier_scores, PL2.CLASSIFIER_ORACLE
    ),
    "zorder_keys": QuerySpec(PL2.zorder_keys, PL2.ZORDER_KEYS_ORACLE),
    "doc_oov_rate": QuerySpec(PL2.doc_oov_rate, PL2.OOV_ORACLE),
    "semdedup_incremental": QuerySpec(
        PL2.semdedup_incremental, PL2.SEMDEDUP_INCREMENTAL_ORACLE
    ),
    "cdc_orders_state": QuerySpec(PL2.cdc_orders_state, PL2.CDC_ORACLE),
    "orders_expectations": QuerySpec(
        PL2.orders_expectations, PL2.EXPECTATIONS_ORACLE
    ),
    "part_triangles": QuerySpec(PL2.part_triangles, PL2.PART_TRIANGLES_ORACLE),
    "part_clustering_coeff": QuerySpec(
        PL2.part_clustering_coeff, PL2.PART_CLUSTERING_ORACLE
    ),
    "supplier_hierarchy_rollup": QuerySpec(
        PL2.supplier_hierarchy_rollup, PL2.HIERARCHY_ORACLE
    ),
    "events_hourly_interpolate": QuerySpec(
        PL2.events_hourly_interpolate, PL2.INTERPOLATE_ORACLE
    ),
    "customer_masked_export": QuerySpec(
        PL2.customer_masked_export, PL2.MASKED_EXPORT_ORACLE
    ),
    "customer_kanonymity": QuerySpec(
        PL2.customer_kanonymity, PL2.KANONYMITY_ORACLE
    ),
    "source_temperature_mix": QuerySpec(
        PL2.source_temperature_mix, PL2.TEMPERATURE_MIX_ORACLE
    ),
    "dp_segment_counts": QuerySpec(
        PL2.dp_segment_counts, PL2.DP_COUNTS_ORACLE
    ),
    "funnel_three_step": QuerySpec(PL2.funnel_three_step, PL2.FUNNEL3_ORACLE),
    "orders_target_encoding": QuerySpec(
        PL2.orders_target_encoding, PL2.TARGET_ENCODING_ORACLE
    ),
    "customer_rfm_segments": QuerySpec(
        PL2.customer_rfm_segments, PL2.RFM_ORACLE
    ),
    "rfm_segment_migration": QuerySpec(
        PL2.rfm_segment_migration, PL2.RFM_MIGRATION_ORACLE
    ),
    "part_abc_classification": QuerySpec(
        PL2.part_abc_classification, PL2.ABC_ORACLE
    ),
    "fk_integrity_matrix": QuerySpec(
        PL2.fk_integrity_matrix, PL2.FK_MATRIX_ORACLE
    ),
    "documents_dataset_card": QuerySpec(
        PL2.documents_dataset_card, PL2.DATASET_CARD_ORACLE
    ),
    "doc_bm25_scores": QuerySpec(PL2.doc_bm25_scores, PL2.BM25_ORACLE),
    # deterministic KMV + bottom-k-sample sketches since round 11 — the
    # formerly rows-only entry is now strict-hash-checked; the
    # engine-private approx_count_distinct/percentile_approx built-ins
    # stay exercised by approx_stats_error_check (error-bound gate).
    "approx_event_stats": QuerySpec(
        A2.approx_event_stats, A2.APPROX_EVENT_STATS_ORACLE
    ),
    # KMV bottom-k sketch: the PORTABLE approximate-distinct companion —
    # deterministic hash order statistics, estimate itself hash-checked
    "kmv_distinct_users": QuerySpec(A2.kmv_distinct_users, A2.KMV_ORACLE),
    "media_features": QuerySpec(TD.media_features, TD.MEDIA_FEATURES_ORACLE),
    # raw stream emission is engine-side by nature; each stream's PRIMARY
    # correctness entry is its stream-vs-batch-twin diff below (empty-set
    # oracle) — the raw rows-only registrations were dropped in round 4.
    "stream_vs_batch_windowed_diff": QuerySpec(
        _stream_windowed_diff, _stream_diff_oracle()
    ),
    "stream_vs_batch_totals_diff": QuerySpec(
        _stream_totals_diff, _totals_diff_oracle()
    ),
    "stream_dedup_diff": QuerySpec(_stream_dedup_diff, _stream_dedup_oracle()),
    # streaming CDC source (round 13): the manifest change feed as a
    # real Structured Streaming source (Python DataSource API) —
    # streamed rows must equal the batch read of the final table
    "stream_cdc_diff": QuerySpec(_stream_cdc_diff, _stream_cdc_oracle()),
    # the DELETE side of the CDC contract: a keyed-upsert rewrite's
    # v1→v2 feed must equal (delete = pre-upsert table) ∪ (insert =
    # post-upsert table); empty-set oracle
    "stream_cdc_rewrite_diff": QuerySpec(
        _stream_cdc_rewrite_diff, _stream_cdc_rewrite_oracle()
    ),
    "stream_attribution_diff": QuerySpec(
        _stream_attribution_diff, _stream_attr_oracle()
    ),
    "stream_attribution_outer_diff": QuerySpec(
        _stream_attribution_outer_diff, _stream_attr_outer_oracle()
    ),
    "stream_attribution_right_diff": QuerySpec(
        _stream_attribution_right_diff, _stream_attr_right_oracle()
    ),
    "stream_attribution_full_diff": QuerySpec(
        _stream_attribution_full_diff, _stream_attr_full_oracle()
    ),
    "stream_static_join_diff": QuerySpec(
        _stream_static_join_diff, _stream_static_oracle()
    ),
    "stream_sliding_counts_diff": QuerySpec(
        _stream_sliding_diff, _stream_sliding_oracle()
    ),
    "stream_builtin_session_diff": QuerySpec(
        _stream_builtin_session_diff, _stream_builtin_session_oracle()
    ),
    "stream_sessionize_diff": QuerySpec(
        _stream_sessionize_diff, _stream_sessionize_oracle()
    ),
    # round-7 wave: sketch-bounded heavy hitters, sparse lexical cosine,
    # bounded k-core peeling, grouped two-phase rank quantiles
    "heavy_hitter_tokens": QuerySpec(
        PL3.heavy_hitter_tokens, PL3.HEAVY_HITTER_ORACLE, headline=True
    ),
    "doc_tfidf_cosine_pairs": QuerySpec(
        PL3.doc_tfidf_cosine_pairs, PL3.TFIDF_COSINE_ORACLE, headline=True
    ),
    "part_kcore": QuerySpec(PL3.part_kcore, PL3.PART_KCORE_ORACLE),
    "source_length_quantiles": QuerySpec(
        PL3.source_length_quantiles, PL3.SOURCE_LENGTH_QUANTILES_ORACLE
    ),
    "bpe_merges": QuerySpec(PL3.bpe_merges, PL3.BPE_MERGES_ORACLE),
    "purchases_asof_forward_tol": QuerySpec(
        PL3.purchases_asof_forward_tol, PL3.ASOF_FORWARD_TOL_ORACLE
    ),
    "purchases_asof_nearest": QuerySpec(
        PL3.purchases_asof_nearest, PL3.ASOF_NEAREST_ORACLE
    ),
    "embedding_covariance": QuerySpec(
        PL3.embedding_covariance, PL3.EMBEDDING_COVARIANCE_ORACLE
    ),
    "pca_quality_check": QuerySpec(
        PL3.pca_quality_check, PL3.PCA_QUALITY_ORACLE
    ),
    "classifier_calibration_bins": QuerySpec(
        PL3.classifier_calibration_bins, PL3.CALIBRATION_ORACLE
    ),
    "lineitem_corr_matrix": QuerySpec(
        PL3.lineitem_corr_matrix, PL3.LINEITEM_CORR_ORACLE
    ),
    "kmv_source_jaccard": QuerySpec(
        PL3.kmv_source_jaccard, PL3.KMV_SOURCE_JACCARD_ORACLE
    ),
    "stream_heavy_hitter_superset_diff": QuerySpec(
        _stream_hh_superset_diff, _stream_hh_oracle()
    ),
    "doc_novelty_scores": QuerySpec(
        PL3.doc_novelty_scores, PL3.DOC_NOVELTY_ORACLE
    ),
    "priority_status_mutual_info": QuerySpec(
        PL3.priority_status_mutual_info, PL3.MUTUAL_INFO_ORACLE
    ),
    "session_concurrency_hourly": QuerySpec(
        PL4.session_concurrency_hourly, PL4.SESSION_CONCURRENCY_ORACLE, headline=True
    ),
    "nation_revenue_ols": QuerySpec(
        PL4.nation_revenue_ols, PL4.NATION_OLS_ORACLE
    ),
    "doc_shard_manifest": QuerySpec(
        PL4.doc_shard_manifest, PL4.DOC_SHARD_MANIFEST_ORACLE
    ),
    "rolling_7d_active_users": QuerySpec(
        PL4.rolling_7d_active_users, PL4.ROLLING_7D_ORACLE
    ),
    "dau_overlap_churn": QuerySpec(
        PL4.dau_overlap_churn, PL4.DAU_OVERLAP_ORACLE
    ),
    "source_ks_matrix": QuerySpec(
        PL4.source_ks_matrix, PL4.SOURCE_KS_ORACLE
    ),
    "customer_gini_by_nation": QuerySpec(
        PL4.customer_gini_by_nation, PL4.CUSTOMER_GINI_ORACLE, headline=True
    ),
    "revenue_cusum_changepoint": QuerySpec(
        PL4.revenue_cusum_changepoint, PL4.REVENUE_CUSUM_ORACLE
    ),
    "totalprice_benford": QuerySpec(
        PL4.totalprice_benford, PL4.TOTALPRICE_BENFORD_ORACLE
    ),
    "brand_association_rules": QuerySpec(
        PL4.brand_association_rules, PL4.BRAND_RULES_ORACLE
    ),
    "daily_revenue_acf": QuerySpec(
        PL4.daily_revenue_acf, PL4.DAILY_ACF_ORACLE
    ),
    "event_value_trimmed_mean": QuerySpec(
        PL4.event_value_trimmed_mean, PL4.EVENT_TRIMMED_MEAN_ORACLE
    ),
    "events_variant_props": QuerySpec(
        PL4.events_variant_props, PL4.EVENTS_VARIANT_ORACLE
    ),
    "source_mwu_matrix": QuerySpec(
        PL4.source_mwu_matrix, PL4.SOURCE_MWU_ORACLE
    ),
    "stream_concurrency_diff": QuerySpec(
        _stream_concurrency_diff, _stream_concurrency_oracle()
    ),
    "reorder_survival_km": QuerySpec(
        PL4.reorder_survival_km, PL4.REORDER_KM_ORACLE
    ),
    "segment_logrank_test": QuerySpec(
        PL4.segment_logrank_test, PL4.SEGMENT_LOGRANK_ORACLE
    ),
    "daily_revenue_mann_kendall": QuerySpec(
        PL5.daily_revenue_mann_kendall, PL5.MANN_KENDALL_ORACLE
    ),
    "daily_revenue_theil_sen": QuerySpec(
        PL5.daily_revenue_theil_sen, PL5.THEIL_SEN_ORACLE, headline=True
    ),
    "hll_distinct_users": QuerySpec(
        PL5.hll_distinct_users, PL5.HLL_ORACLE
    ),
    "event_value_quantile_norm": QuerySpec(
        PL5.event_value_quantile_norm, PL5.QUANTILE_NORM_ORACLE
    ),
    "part_lpa_communities": QuerySpec(
        PL5.part_lpa_communities, PL5.LPA_ORACLE
    ),
    "daily_revenue_ewma": QuerySpec(
        PL5.daily_revenue_ewma, PL5.EWMA_ORACLE
    ),
    "part_hits_authority": QuerySpec(
        PL5.part_hits_authority, PL5.HITS_ORACLE
    ),
    "part_degree_assortativity": QuerySpec(
        PL5.part_degree_assortativity, PL5.ASSORTATIVITY_ORACLE
    ),
    "weekday_revenue_anomalies": QuerySpec(
        PL5.weekday_revenue_anomalies, PL5.WEEKDAY_ANOMALY_ORACLE
    ),
    "cms_user_event_counts": QuerySpec(
        PL5.cms_user_event_counts, PL5.CMS_ORACLE
    ),
    "bloom_join_prefilter": QuerySpec(
        PL5.bloom_join_prefilter, PL5.BLOOM_ORACLE, headline=True
    ),
    "source_psi_matrix": QuerySpec(
        PL5.source_psi_matrix, PL5.PSI_ORACLE
    ),
    "segment_target_encoding_loo": QuerySpec(
        PL5.segment_target_encoding_loo, PL5.TARGET_ENCODING_ORACLE
    ),
    "corpus_feature_hashing": QuerySpec(
        PL5.corpus_feature_hashing, PL5.FEATURE_HASHING_ORACLE
    ),
    "stream_cms_diff": QuerySpec(
        _stream_cms_diff, _stream_cms_oracle()
    ),
    "stream_hll_diff": QuerySpec(
        _stream_hll_diff, _stream_hll_oracle()
    ),
    "stream_contamination_diff": QuerySpec(
        _stream_contamination_diff, _stream_contamination_oracle()
    ),
    "cohort_ltv_curve": QuerySpec(
        PL5.cohort_ltv_curve, PL5.COHORT_LTV_ORACLE
    ),
    "brand_price_ols2": QuerySpec(
        PL5.brand_price_ols2, PL5.BRAND_OLS2_ORACLE
    ),
    "top_session_paths": QuerySpec(
        PL5.top_session_paths, PL5.TOP_PATHS_ORACLE
    ),
    "session_duration_percentiles": QuerySpec(
        PL5.session_duration_percentiles, PL5.SLA_PERCENTILES_ORACLE
    ),
    "user_interarrival_expfit": QuerySpec(
        PL5.user_interarrival_expfit, PL5.EXPFIT_ORACLE
    ),
    "ann_index_build": QuerySpec(
        PL5.ann_index_build, PL5.ANN_BUILD_ORACLE, headline=True
    ),
    "ann_retrieval_matrix": QuerySpec(
        PL5.ann_retrieval_matrix, PL5.ANN_MATRIX_ORACLE, headline=True
    ),
    "lsh_retrieval_metrics": QuerySpec(
        PL5.lsh_retrieval_metrics, PL5.IR_METRICS_ORACLE
    ),
    "purchase_attribution_mta": QuerySpec(
        PL5.purchase_attribution_mta, PL5.PURCHASE_MTA_ORACLE
    ),
    "order_reconciliation_audit": QuerySpec(
        PL5.order_reconciliation_audit, PL5.RECONCILIATION_ORACLE
    ),
    "duplicate_payment_screen": QuerySpec(
        PL5.duplicate_payment_screen, PL5.DUPLICATE_PAYMENT_ORACLE
    ),
    "daily_revenue_stl_lite": QuerySpec(
        PL6.daily_revenue_stl_lite, PL6.STL_LITE_ORACLE
    ),
    "revenue_forecast_backtest": QuerySpec(
        PL6.revenue_forecast_backtest, PL6.FORECAST_BACKTEST_ORACLE
    ),
    "brand_return_rate_wilson": QuerySpec(
        PL6.brand_return_rate_wilson, PL6.WILSON_ORACLE
    ),
    "part_price_size_skyline": QuerySpec(
        PL6.part_price_size_skyline, PL6.SKYLINE_ORACLE, headline=True
    ),
    "lpa_modularity": QuerySpec(
        PL6.lpa_modularity, PL6._lpa_modularity_oracle()
    ),
    "hll_period_overlap": QuerySpec(
        PL6.hll_period_overlap, PL6._hll_overlap_oracle()
    ),
    "part_supply_hhi": QuerySpec(PL6.part_supply_hhi, PL6.HHI_ORACLE),
    "event_hour_entropy": QuerySpec(
        PL6.event_hour_entropy, PL6.HOUR_ENTROPY_ORACLE
    ),
    "ab_test_cuped": QuerySpec(PL6.ab_test_cuped, PL6._cuped_oracle()),
    "lsh_edit_distance_pairs": QuerySpec(
        PL6.lsh_edit_distance_pairs, PL6._edit_distance_oracle()
    ),
    "source_centroid_similarity": QuerySpec(
        PL6.source_centroid_similarity, PL6.CENTROID_SIM_ORACLE
    ),
    "hard_negative_mining": QuerySpec(
        PL6.hard_negative_mining, PL6._hard_negative_oracle()
    ),
    "stl_strength_measures": QuerySpec(
        PL6.stl_strength_measures, PL6._stl_strength_oracle()
    ),
    "session_gap_sensitivity": QuerySpec(
        PL6.session_gap_sensitivity, PL6.GAP_SENSITIVITY_ORACLE
    ),
    "event_type_pmi": QuerySpec(PL6.event_type_pmi, PL6.EVENT_PMI_ORACLE),
    "customer_feature_store": QuerySpec(
        PL6.customer_feature_store, PL6.FEATURE_STORE_ORACLE
    ),
    "quantile_histogram_check": QuerySpec(
        PL6.quantile_histogram_check, PL6._quantile_histogram_oracle()
    ),
    "funnel_conversion_wilson": QuerySpec(
        PL6.funnel_conversion_wilson, PL6._funnel_wilson_oracle()
    ),
    "part_two_hop_features": QuerySpec(
        PL6.part_two_hop_features, PL6._two_hop_oracle()
    ),
    "revenue_dip_recovery": QuerySpec(
        PL6.revenue_dip_recovery, PL6.DIP_RECOVERY_ORACLE
    ),
    "revenue_bollinger_bands": QuerySpec(
        PL6.revenue_bollinger_bands, PL6.BOLLINGER_ORACLE
    ),
    "sorted_neighborhood_pairs": QuerySpec(
        PL6.sorted_neighborhood_pairs, PL6.SNM_ORACLE
    ),
    "neyman_allocation": QuerySpec(
        PL6.neyman_allocation, PL6._neyman_oracle()
    ),
    "doc_readability": QuerySpec(PL6.doc_readability, PL6.READABILITY_ORACLE),
    "markov_entropy_rate": QuerySpec(
        PL6.markov_entropy_rate, PL6.ENTROPY_RATE_ORACLE
    ),
    "fulfillment_latency_percentiles": QuerySpec(
        PL6.fulfillment_latency_percentiles, PL6._fulfillment_oracle()
    ),
    "media_simhash_pairs": QuerySpec(
        PL6.media_simhash_pairs, PL6._media_simhash_oracle()
    ),
    "neardup_cluster_sizes": QuerySpec(
        PL6.neardup_cluster_sizes, PL6._neardup_sizes_oracle()
    ),
    # --- round-8 extension wave (pipeline7) ---
    "order_record_highs": QuerySpec(
        PL7.order_record_highs, PL7.RECORD_HIGHS_ORACLE, headline=True
    ),
    "revenue_max_drawdown": QuerySpec(
        PL7.revenue_max_drawdown, PL7.MAX_DRAWDOWN_ORACLE
    ),
    "filtered_knn": QuerySpec(
        PL7.filtered_knn, PL7._filtered_knn_oracle()
    ),
    "prefix_filter_jaccard_pairs": QuerySpec(
        PL7.prefix_filter_jaccard_pairs, PL7.PREFIX_FILTER_ORACLE, headline=True
    ),
    "prefix_filter_jaccard_between": QuerySpec(
        PL7.prefix_filter_jaccard_between, PL7.PREFIX_FILTER_BETWEEN_ORACLE
    ),
    "conformal_coverage_check": QuerySpec(
        PL7.conformal_coverage_check, PL7.CONFORMAL_ORACLE
    ),
    "doc_kneser_ney_surprisal": QuerySpec(
        PL7.doc_kneser_ney_surprisal, PL7.KNESER_NEY_ORACLE
    ),
    "stream_quantile_hist_diff": QuerySpec(
        _stream_qhist_diff, _stream_qhist_oracle()
    ),
    "markov_top1_accuracy": QuerySpec(
        PL7.markov_top1_accuracy, PL7.MARKOV_TOP1_ORACLE
    ),
    "dedup_funnel_report": QuerySpec(
        PL7.dedup_funnel_report, PL7.DEDUP_FUNNEL_ORACLE
    ),
    "ridge_regression_normal_eq": QuerySpec(
        PL8.ridge_regression_normal_eq, PL8.RIDGE_ORACLE
    ),
    "customer_revenue_gini": QuerySpec(
        PL8.customer_revenue_gini, PL8.GINI_ORACLE
    ),
    "event_user_kaplan_meier": QuerySpec(
        PL8.event_user_kaplan_meier, PL8.KM_ORACLE
    ),
    "doc_ttr_hapax": QuerySpec(PL8.doc_ttr_hapax, PL8.TTR_ORACLE),
    "ivf_pq_residual_knn": QuerySpec(
        TD.ivf_pq_residual_knn, TD.IVF_PQ_RESIDUAL_ORACLE, headline=True
    ),
    "revenue_lorenz_deciles": QuerySpec(
        PL8.revenue_lorenz_deciles, PL8.LORENZ_ORACLE
    ),
    "lang_source_chi2": QuerySpec(PL8.lang_source_chi2, PL8.CHI2_ORACLE),
    "revenue_bootstrap_ci": QuerySpec(
        PL8.revenue_bootstrap_ci, PL8.BOOTSTRAP_ORACLE, headline=True
    ),
    "lineitem_discount_auc": QuerySpec(
        PL8.lineitem_discount_auc, PL8.MANNWHITNEY_ORACLE
    ),
    "langid_confusion_matrix": QuerySpec(
        PL8.langid_confusion_matrix, PL8.LANGID_CONFUSION_ORACLE
    ),
    "daily_revenue_cusum": QuerySpec(
        PL8.daily_revenue_cusum, PL8.CUSUM_ORACLE
    ),
    "synthlogs_status_rollup": QuerySpec(
        PL8.synthlogs_status_rollup, PL8.SYNTHLOGS_ROLLUP_ORACLE
    ),
    "logistic_return_model": QuerySpec(
        PL8.logistic_return_model, PL8.LOGISTIC_ORACLE
    ),
    "logistic_model_auc": QuerySpec(
        PL8.logistic_model_auc, PL8.LOGISTIC_AUC_ORACLE
    ),
    "kaplan_meier_by_cohort": QuerySpec(
        PL8.kaplan_meier_by_cohort, PL8.KM_COHORT_ORACLE
    ),
    "token_good_turing": QuerySpec(
        PL8.token_good_turing, PL8.GOOD_TURING_ORACLE
    ),
    "suffix_dup_removal": QuerySpec(
        TD.suffix_dup_removal, TD.SUFFIX_DUP_REMOVAL_ORACLE
    ),
    "suffix_contamination_spans": QuerySpec(
        TD.suffix_contamination_spans, TD.SUFFIX_CONTAMINATION_ORACLE
    ),
    "discount_quantity_spearman": QuerySpec(
        PL9.discount_quantity_spearman, PL9.SPEARMAN_ORACLE
    ),
    "discount_quantity_kendall": QuerySpec(
        PL9.discount_quantity_kendall, PL9.KENDALL_ORACLE
    ),
    "doc_kn_trigram_surprisal": QuerySpec(
        PL9.doc_kn_trigram_surprisal, PL9.KN_TRIGRAM_ORACLE, headline=True
    ),
    "nation_revenue_lorenz": QuerySpec(
        PL9.nation_revenue_lorenz, PL9.NATION_LORENZ_ORACLE
    ),
    "logistic_isotonic_recalibration": QuerySpec(
        PL9.logistic_isotonic_recalibration, PL9.ISOTONIC_RECAL_ORACLE
    ),
    "quality_isotonic_recalibration": QuerySpec(
        PL9.quality_isotonic_recalibration, PL9.QUALITY_ISOTONIC_ORACLE
    ),
    "logistic_calibration_curve": QuerySpec(
        PL8.logistic_calibration_curve, PL8.LOGISTIC_CALIBRATION_ORACLE
    ),
    "purchase_concurrent_sessions": QuerySpec(
        PL10.purchase_concurrent_sessions,
        PL10.CONCURRENT_SESSIONS_ORACLE,
        headline=True,
    ),
    "customer_order_overlap": QuerySpec(
        PL10.customer_order_overlap, PL10.ORDER_OVERLAP_ORACLE
    ),
    "nb_language_confusion": QuerySpec(
        PL10.nb_language_confusion, PL10.NB_CONFUSION_ORACLE, headline=True
    ),
    "revenue_permutation_test": QuerySpec(
        PL10.revenue_permutation_test, PL10.PERMUTATION_ORACLE
    ),
    "daily_revenue_ljung_box": QuerySpec(
        PL10.daily_revenue_ljung_box, PL10.LJUNG_BOX_ORACLE
    ),
    "matryoshka_recall_check": QuerySpec(
        PL10.matryoshka_recall_check, PL10.MATRYOSHKA_ORACLE
    ),
    "customer_l_diversity": QuerySpec(
        PL10.customer_l_diversity, PL10.L_DIVERSITY_ORACLE
    ),
    "stream_interval_join_diff": QuerySpec(
        _stream_interval_join_diff, _stream_interval_oracle()
    ),
    "gbdt_stump_return_model": QuerySpec(
        PL10.gbdt_stump_return_model, PL10.GBDT_STUMP_ORACLE, headline=True
    ),
    "nation_urgent_fdr": QuerySpec(
        PL10.nation_urgent_fdr, PL10.NATION_FDR_ORACLE
    ),
    "nb_loso_source_accuracy": QuerySpec(
        PL10.nb_loso_source_accuracy, PL10.NB_LOSO_ORACLE
    ),
    "media_frame_manifest": QuerySpec(
        PL10.media_frame_manifest, PL10.MEDIA_FRAME_ORACLE
    ),
    "revenue_evalue_monitor": QuerySpec(
        PL10.revenue_evalue_monitor, PL10.EVALUE_ORACLE
    ),
    "order_hbos_outliers": QuerySpec(
        PL10.order_hbos_outliers, PL10.HBOS_ORACLE
    ),
    "agms_join_size": QuerySpec(PL10.agms_join_size, PL10.AGMS_ORACLE),
    "als_user_factors": QuerySpec(PL10.als_user_factors, PL10.ALS_ORACLE),
    "join_strategy_probe": QuerySpec(
        PL10.join_strategy_probe, PL10.ADVISOR_ORACLE
    ),
    "frequent_event_triples": QuerySpec(
        PL10.frequent_event_triples, PL10.EVENT_TRIPLES_ORACLE
    ),
    "dp_local_frequency": QuerySpec(
        PL10.dp_local_frequency, PL10.DP_LOCAL_ORACLE
    ),
    "revenue_diff_in_diff": QuerySpec(
        PL10.revenue_diff_in_diff, PL10.DID_ORACLE
    ),
    "logistic_brier_decomposition": QuerySpec(
        PL10.logistic_brier_decomposition, PL10.BRIER_ORACLE
    ),
    "fellegi_sunter_weights": QuerySpec(
        PL10.fellegi_sunter_weights, PL10.FELLEGI_SUNTER_ORACLE
    ),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark for n, s in REGISTRY.items() if s.headline}
