"""Query registry: the single source of truth behind the driver contract.

Every operator from SURVEY.md §2 registers itself here with

- a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``, and
- (when SQL-expressible) its DuckDB oracle twin — an ANSI-SQL string over
  the pre-registered parquet views (region nation customer supplier part
  orders lineitem events documents embeddings).

``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``. ``tests/test_oracle_parity.py`` runs the same
Spark-vs-DuckDB comparison the driver runs, locally at sf0.001.

Determinism rules (FIXTURES.md §6): every float output is ROUND(x, 6) on
both sides; every ranking has a unique tiebreak column; no wall-clock, no
unseeded randomness; timestamps leave the engine as epoch seconds BIGINT
so session-timezone settings cannot skew the comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver falls back to rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (SURVEY.md §2 inventory)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registration side effects run."""
    from .operators import (  # noqa: F401
        analytics,
        dedup,
        evaluation,
        extended,
        features,
        graph,
        grouped,
        linalg,
        multimodal,
        relational,
        scale,
        similarity,
        text,
        training,
        windows,
    )
    from .models import queries as model_queries  # noqa: F401
    from .streaming import windows as streaming_windows  # noqa: F401


# The driver's CORRECTNESS gate checks the first 50 entries of ``queries()``
# per round, so coverage rotates: this list fronts the names that most need
# a driver verdict; every name NOT listed here is already driver-green
# (CORRECTNESS_r01-r05) and falls back to registration order behind them.
# Round-6 front, in order (VERDICT r05 item 1): after five rounds the
# cumulative driver-green count is 231/421, so the entire list is now the
# 190 never-driver-checked queue —
#   (a) the LLM-pipeline ops still sweep-only (PQ quantize/rerank, kNN
#       eval, sorted-neighborhood / chunk-rewrite / cross-corpus dedup,
#       audio + scene-change kernels, n-gram novelty, the composed
#       curation pipeline, RRF, winnowing, PPMI, bigram LM);
#   (b) the TPC-H SQL-verbatim pins (Q3-Q22);
#   (c) the never-checked streaming twins;
#   (d) the remaining queue, oldest first — keep rotating 50 per round
#       until every name has a CORRECTNESS_r* row.
DRIVER_PRIORITY: list[str] = [
    "similarity_pq_rerank",
    "embedding_pq_quantize",
    "knn_classifier_eval",
    "embedding_truncation_overlap",
    "doc_similarity_sparse",
    "minhash_incremental_merge",
    "minhash_band_sweep",
    "dedup_sorted_neighborhood",
    "dedup_chunk_rewrite",
    "dedup_cross_corpus_anti",
    "boilerplate_shingle_profile",
    "multimodal_audio_features",
    "multimodal_scene_change",
    "ngram_novelty_score",
    "corpus_curation_pipeline",
    "hybrid_search_rrf",
    "winnowing_fingerprint",
    "ppmi_cooccurrence",
    "bigram_lm_logprob",
    "sql_interface_q3",
    "sql_interface_q4",
    "sql_interface_q5",
    "sql_interface_q6",
    "sql_interface_q7",
    "sql_interface_q8",
    "sql_interface_q10",
    "sql_interface_q13",
    "sql_interface_q14",
    "sql_interface_q15",
    "sql_interface_q17",
    "sql_interface_q18",
    "sql_interface_q19",
    "sql_interface_q22",
    "stream_checkpoint_resume",
    "stream_update_mode",
    "stream_available_now",
    "stream_daily_unique_users",
    "stream_join_left_outer",
    "stream_countmin_rollup",
    "stream_dau_daily",
    "stream_slo_burn",
    "stream_cart_abandonment",
    "cumulative_unique_users",
    "join_partition_pruned",
    "timeseries_interpolate_linear",
    "grouped_skew_kurtosis",
    "map_functions_suite",
    "join_range_bucketized",
    "consistent_hash_assignment",
    "join_asof_tolerance",
    "sketch_persist_roundtrip",
    "scan_struct_pushdown",
    "grouping_id_semantics",
    "explode_outer_semantics",
    "scan_jsonl_quarantine",
    "abc_classification",
    "log2_histogram",
    "grouped_topk_array",
    "pii_pseudonymize",
    "try_arithmetic_suite",
    "union_schema_drift",
    "observe_metrics",
    "generate_date_dim",
    "overflow_semantics",
    "decimal_money_suite",
    "sink_parquet_zstd",
    "join_hint_merge",
    "collation_semantics",
    "sql_lateral_topk",
    "interval_overlap_join",
    "activity_heatmap",
    "argmax_per_group",
    "string_agg_ordered",
    "id_gap_audit",
    "dense_scaffold_fill",
    "date_format_suite",
    "event_debounce",
    "regex_extract_all_suite",
    "session_duration_stats",
    "join_dirty_keys",
    "top_movers",
    "concurrent_intervals_daily",
    "scan_multi_format_union",
    "dedup_keep_best",
    "snapshot_diff",
    "nth_value_suite",
    "events_since_purchase",
    "pivot_multi_measure",
    "running_compound_growth",
    "array_set_ops_suite",
    "new_vs_returning_daily",
    "frequency_cap",
    "churn_risk_flags",
    "string_functions_extra",
    "bitwise_ops_suite",
    "boolean_agg_suite",
    "rolling_zscore",
    "join_null_safe_keys",
    "join_outer_suite",
    "monotonicity_audit",
    "share_of_parent",
    "join_fallback_hierarchy",
    "weighted_moving_avg",
    "trimmed_mean_grouped",
    "sink_parquet_sized",
    "grouped_agg_pandas_udf",
    "map_in_arrow_passthrough",
    "surrogate_keys",
    "table_fingerprint",
    "session_window_dynamic_gap",
    "feature_minmax_scale",
    "peak_activity_cell",
    "split_leakage_audit",
    "quality_stratified_sample",
    "hierarchy_closure_recursive",
    "udtf_order_milestones",
    "corpus_jsonl_gz_roundtrip",
    "rolling_distinct_users_7d",
    "personalized_pagerank",
    "session_entropy",
    "percentile_disc_exact",
    "covisitation_timebound",
    "recs_novelty",
    "quantile_normalize",
    "funnel_step_deadlines",
    "grouped_ols_2var",
    "daily_crosscorr_lags",
    "revenue_changepoint_fit",
    "inventory_fifo_matching",
    "woe_iv_binning",
    "holt_linear_forecast",
    "diff_in_diff",
    "kmeans_lloyd_epoch",
    "ab_srm_check",
    "largest_remainder_apportionment",
    "label_propagation_communities",
    "mmr_rerank",
    "attribution_position_based",
    "feature_robust_scale",
    "frequent_itemsets_l3",
    "dp_noisy_counts",
    "record_linkage_fs_weights",
    "sequence_regex_match",
    "graph_shortest_paths_weighted",
    "survival_nelson_aalen",
    "causal_impact_lite",
    "ipw_ate_by_segment",
    "countmin_sketch_rollup",
    "geo_grid_knn",
    "forecast_backtest_mase",
    "wilson_ci_ranking",
    "seasonal_decompose_additive",
    "ab_sequential_sprt",
    "graph_degree_assortativity",
    "burstiness_interevent",
    "ratio_metric_delta_method",
    "pandas_udf_scalar_textfeats",
    "histogram_equi_depth",
    "recs_intra_list_diversity",
    "bayes_beta_binomial",
    "qini_uplift_deciles",
    "dau_mau_stickiness",
    "acf_daily_revenue",
    "herfindahl_concentration",
    "permutation_test_diff",
    "hampel_outlier_filter",
    "xyz_variability_classes",
    "slo_burn_alerts",
    "cramers_v_matrix",
    "growth_accounting_weekly",
    "ab_cuped_adjustment",
    "user_segment_bitmaps",
    "embedding_outlier_flags",
    "attribution_time_decay",
    "funnel_within_window",
    "metric_change_contribution",
    "team_draft_interleaving",
    "join_cardinality_estimate",
    "event_lateness_profile",
    "k_anonymity_audit",
    "price_volume_mix_bridge",
    "expected_calibration_error",
    "reorder_point_policy",
    "net_revenue_retention",
    "ranking_rbo_drift",
    "blocking_quality_eval",
    "cart_abandonment_daily",
    "bloom_fpr_audit",
    "text_boilerplate_share",
    "sink_jsonl_gzip",
]


def _driver_order(names: list[str]) -> list[str]:
    """Priority names first (in DRIVER_PRIORITY order), the rest in
    registration order."""
    rank = {n: i for i, n in enumerate(DRIVER_PRIORITY)}
    prioritized = [n for n in DRIVER_PRIORITY if n in REGISTRY]
    rest = [n for n in names if n not in rank]
    return prioritized + rest


def all_queries() -> dict[str, QueryFn]:
    load_all_operators()
    return {n: REGISTRY[n].fn for n in _driver_order(list(REGISTRY))}


def all_oracles() -> dict[str, str]:
    load_all_operators()
    return {
        n: REGISTRY[n].oracle
        for n in _driver_order(list(REGISTRY))
        if REGISTRY[n].oracle is not None
    }
