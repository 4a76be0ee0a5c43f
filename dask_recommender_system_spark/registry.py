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
# Round-4 front, in order:
#   (a) the promotions whose implementation or oracle changed this
#       round (rows-only -> full value verdicts: dedup_minhash +
#       dedup_simhash via the portable md5-60-bit hash family,
#       stream_sessionize, both ANN paths, both multimodal kernels;
#       plan rework: dedup_embedding_cosine) - they must re-earn a
#       driver row;
#   (b) the 141 locally-green queries never yet inside a driver window,
#       float-surface ops first (VERDICT r03 item 1). Slots 1-50 are the
#       round-4 window; the remainder fronts round 5. Keep in sync when
#       adding queries until every name has a CORRECTNESS_r* row;
#   (c) queries NEW in round 4 (X232-X257), appended at the back of the
#       never-checked queue.
DRIVER_PRIORITY: list[str] = [
    # ---- (a) promotions: changed this round, need fresh driver rows ----
    # raw LSH structures flipped to full value verdicts (portable
    # md5-60-bit hash family, oracle recomputes the signatures)
    "dedup_minhash",
    "dedup_simhash",
    "stream_sessionize",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "multimodal_decode",
    "multimodal_frame_sample",
    "dedup_embedding_cosine",
    # money aggregates rewritten in exact integer cents + attribution
    # oracle re-floored to seconds after the sf0.1 sweep finds — changed
    # behavior, so they re-earn driver rows (attribution_last_touch is
    # already below in the never-checked block)
    "sql_interface_q1",
    "join_bloom_pruned",
    # ---- (b) never driver-checked (rotation debt, oldest first) ----
    "interval_union_length",
    "sink_compacted",
    "schema_evolution_merge",
    "dedup_url_canonicalize",
    "embedding_covariance",
    "stream_drift_psi",
    "bpe_merge_pairs",
    "bpr_epoch_item_update",
    "join_asof_forward",
    "join_asof_nearest",
    "attribution_last_touch",
    "decile_lift_table",
    "ranking_metrics_at_k",
    "auc_roc",
    "calibration_bins",
    "welch_ttest",
    "ks_test_drift",
    "mann_whitney_u",
    "kaplan_meier_retention",
    "gini_popularity",
    "zipf_fit",
    "target_encoding",
    "feature_hashing",
    "split_next_item",
    "als_implicit_epoch",
    "markov_next_item",
    "bootstrap_ci",
    "confusion_threshold_sweep",
    "graph_triangle_stats",
    "stream_topk_items",
    "seasonal_dow_profile",
    "cohort_ltv",
    "price_elasticity",
    "pca_power_iteration",
    "recommendation_coverage",
    "ab_power_mde",
    "kll_quantile_rollup",
    "theta_sketch_set_ops",
    "variant_shred",
    "gaps_islands",
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
    # ---- new in round 4 ----
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
    "hysteresis_alert_flags",
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
    "conformal_prediction_interval",
    "sequence_regex_match",
    "graph_shortest_paths_weighted",
    "survival_nelson_aalen",
    "causal_impact_lite",
    "ipw_ate_by_segment",
    "stream_hysteresis_alerts",
    "sql_interface_q13",
    "sql_interface_q14",
    "countmin_sketch_rollup",
    "isotonic_calibration",
    "geo_grid_knn",
    "hybrid_search_rrf",
    "forecast_backtest_mase",
    "wilson_ci_ranking",
    "seasonal_decompose_additive",
    "shapley_attribution",
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
    "rate_limit_token_bucket",
    "stream_rate_limit",
    "qini_uplift_deciles",
    "dau_mau_stickiness",
    "acf_daily_revenue",
    "spearman_corr_grouped",
    "herfindahl_concentration",
    "permutation_test_diff",
    "bin_pack_next_fit",
    "multimodal_image_ahash",
    "hampel_outlier_filter",
    "mann_kendall_trend",
    "stream_bin_pack",
    "xyz_variability_classes",
    "stream_dau_daily",
    "slo_burn_alerts",
    "cramers_v_matrix",
    "growth_accounting_weekly",
    "ab_cuped_adjustment",
    "stream_slo_burn",
    "multimodal_dup_clusters",
    "holt_winters_additive",
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
    "queue_lindley_wait",
    "stream_queue_lindley",
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
