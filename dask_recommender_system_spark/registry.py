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
# (CORRECTNESS_r01-r03) and falls back to registration order behind them.
# Round-5 front, in order (VERDICT r04 item 2):
#   (a) user_ewma — its only driver row is an r01 no_oracle error and the
#       oracle has existed since r02; it re-earns a value verdict first;
#   (b) the queries whose implementation or oracle changed THIS round and
#       must re-earn driver rows: the 64-bit aHash pair, the 120-bit
#       simhash pair, and the three training queries promoted from
#       err:no_oracle to invariant-audit oracles;
#   (c) the stateful/GROUPED_MAP recurrence family and the round-4
#       float-surface stats ops the verdict called out;
#   (d) the remaining never-driver-checked queue, oldest first — keep
#       appending new queries at the back until every name has a
#       CORRECTNESS_r* row.
DRIVER_PRIORITY: list[str] = [
    "user_ewma",
    "multimodal_image_ahash",
    "multimodal_dup_clusters",
    "dedup_simhash",
    "dedup_simhash_verified",
    "als_fit_metrics",
    "funk_svd_fit_metrics",
    "mllib_als_recommend",
    "holt_winters_additive",
    "hysteresis_alert_flags",
    "stream_hysteresis_alerts",
    "queue_lindley_wait",
    "stream_queue_lindley",
    "bin_pack_next_fit",
    "stream_bin_pack",
    "rate_limit_token_bucket",
    "stream_rate_limit",
    "spearman_corr_grouped",
    "isotonic_calibration",
    "conformal_prediction_interval",
    "mann_kendall_trend",
    "shapley_attribution",
    "multimodal_payload_dedup",
    "time_decayed_popularity",
    "scan_xml",
    "funnel_time_to_convert",
    "event_rate_cusum",
    "hierarchy_rollup",
    "grouped_mode",
    "benford_deviation",
    "mutual_information_screen",
    "pareto_frontier_2d",
    "approx_percentile_grouped",
    "fuzzy_join_blocked",
    "stream_cdc_upsert",
    "stream_static_enrich",
    "weighted_sample_topk",
    "rolling_trend_window",
    "stream_kll_quantile_monitor",
    "embedding_topk_dims",
    "dq_rule_violations",
    "dedup_fuzzy_clusters",
    "period_over_period",
    "basket_lift",
    "set_ops_bag",
    "array_functions_suite",
    "null_semantics_suite",
    "date_functions_suite",
    "graph_bfs_levels",
    "weighted_median_grouped",
    "cumulative_unique_users",
    "join_partition_pruned",
    "timeseries_interpolate_linear",
    "grouped_skew_kurtosis",
    "map_functions_suite",
    "join_range_bucketized",
    "consistent_hash_assignment",
    "doc_similarity_sparse",
    "join_asof_tolerance",
    "sketch_persist_roundtrip",
    "scan_struct_pushdown",
    "dedup_sorted_neighborhood",
    "grouping_id_semantics",
    "explode_outer_semantics",
    "scan_jsonl_quarantine",
    "minhash_incremental_merge",
    "abc_classification",
    "log2_histogram",
    "grouped_topk_array",
    "sql_interface_q3",
    "stream_checkpoint_resume",
    "pii_pseudonymize",
    "try_arithmetic_suite",
    "corpus_curation_pipeline",
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
    "stream_update_mode",
    "grouped_agg_pandas_udf",
    "map_in_arrow_passthrough",
    "stream_available_now",
    "surrogate_keys",
    "table_fingerprint",
    "session_window_dynamic_gap",
    "feature_minmax_scale",
    "peak_activity_cell",
    "split_leakage_audit",
    "dedup_cross_corpus_anti",
    "quality_stratified_sample",
    "boilerplate_shingle_profile",
    "hierarchy_closure_recursive",
    "udtf_order_milestones",
    "corpus_jsonl_gz_roundtrip",
    "rolling_distinct_users_7d",
    "stream_daily_unique_users",
    "sql_interface_q5",
    "personalized_pagerank",
    "session_entropy",
    "percentile_disc_exact",
    "embedding_pq_quantize",
    "covisitation_timebound",
    "recs_novelty",
    "dedup_chunk_rewrite",
    "minhash_band_sweep",
    "quantile_normalize",
    "funnel_step_deadlines",
    "similarity_pq_rerank",
    "grouped_ols_2var",
    "daily_crosscorr_lags",
    "bigram_lm_logprob",
    "revenue_changepoint_fit",
    "inventory_fifo_matching",
    "woe_iv_binning",
    "sql_interface_q18",
    "winnowing_fingerprint",
    "holt_linear_forecast",
    "diff_in_diff",
    "kmeans_lloyd_epoch",
    "ab_srm_check",
    "largest_remainder_apportionment",
    "ngram_novelty_score",
    "sql_interface_q7",
    "multimodal_audio_features",
    "label_propagation_communities",
    "mmr_rerank",
    "sql_interface_q10",
    "attribution_position_based",
    "feature_robust_scale",
    "stream_join_left_outer",
    "frequent_itemsets_l3",
    "ppmi_cooccurrence",
    "dp_noisy_counts",
    "sql_interface_q4",
    "record_linkage_fs_weights",
    "sequence_regex_match",
    "graph_shortest_paths_weighted",
    "survival_nelson_aalen",
    "causal_impact_lite",
    "ipw_ate_by_segment",
    "sql_interface_q13",
    "sql_interface_q14",
    "countmin_sketch_rollup",
    "geo_grid_knn",
    "hybrid_search_rrf",
    "forecast_backtest_mase",
    "wilson_ci_ranking",
    "seasonal_decompose_additive",
    "sql_interface_q6",
    "ab_sequential_sprt",
    "stream_countmin_rollup",
    "knn_classifier_eval",
    "graph_degree_assortativity",
    "burstiness_interevent",
    "ratio_metric_delta_method",
    "sql_interface_q19",
    "pandas_udf_scalar_textfeats",
    "sql_interface_q17",
    "histogram_equi_depth",
    "sql_interface_q8",
    "sql_interface_q22",
    "sql_interface_q15",
    "recs_intra_list_diversity",
    "bayes_beta_binomial",
    "qini_uplift_deciles",
    "dau_mau_stickiness",
    "acf_daily_revenue",
    "herfindahl_concentration",
    "permutation_test_diff",
    "hampel_outlier_filter",
    "xyz_variability_classes",
    "stream_dau_daily",
    "slo_burn_alerts",
    "cramers_v_matrix",
    "growth_accounting_weekly",
    "ab_cuped_adjustment",
    "stream_slo_burn",
    "user_segment_bitmaps",
    "embedding_outlier_flags",
    "embedding_truncation_overlap",
    "attribution_time_decay",
    "funnel_within_window",
    "metric_change_contribution",
    "team_draft_interleaving",
    "join_cardinality_estimate",
    "event_lateness_profile",
    "multimodal_scene_change",
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
    "stream_cart_abandonment",
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
