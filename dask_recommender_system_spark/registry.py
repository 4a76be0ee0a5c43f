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
# (CORRECTNESS_r01-r06) and falls back to registration order behind them.
# Round-7 front, in order (VERDICT r06 item 1): cumulative driver-green is
# 281/421 after six rounds, so this list is exactly the 140 never-checked
# queue. The first 50 lead with the ops where a driver hash-pass adds the
# most new information —
#   (a) the Arrow/UDF surface still sweep-only (grouped-agg / scalar pandas
#       UDFs, mapInArrow, UDTF);
#   (b) the recurrence kernels (Holt forecast, Lloyd k-means epoch, Hampel);
#   (c) graph / recs (personalized PageRank, LPA communities, MMR, novelty,
#       intra-list diversity);
#   (d) the semantics pins (null-safe / outer joins, explode_outer,
#       grouping_id, overflow, DECIMAL money, collation, try_* arithmetic);
#   (e) sketch / scan plumbing (count-min rollup, sketch persist, struct
#       pushdown, multi-format union, sized parquet / gzip jsonl sinks);
#   (f) hierarchy closure + lateral top-k, then the queue oldest-first —
#       keep rotating 50 per round until every name has a CORRECTNESS_r* row.
DRIVER_PRIORITY: list[str] = [
    "grouped_agg_pandas_udf",
    "map_in_arrow_passthrough",
    "pandas_udf_scalar_textfeats",
    "udtf_order_milestones",
    "holt_linear_forecast",
    "kmeans_lloyd_epoch",
    "hampel_outlier_filter",
    "personalized_pagerank",
    "label_propagation_communities",
    "mmr_rerank",
    "recs_novelty",
    "recs_intra_list_diversity",
    "join_null_safe_keys",
    "join_outer_suite",
    "explode_outer_semantics",
    "grouping_id_semantics",
    "overflow_semantics",
    "decimal_money_suite",
    "collation_semantics",
    "try_arithmetic_suite",
    "countmin_sketch_rollup",
    "sketch_persist_roundtrip",
    "scan_struct_pushdown",
    "scan_multi_format_union",
    "sink_parquet_sized",
    "sink_jsonl_gzip",
    "hierarchy_closure_recursive",
    "sql_lateral_topk",
    "scan_jsonl_quarantine",
    "abc_classification",
    "log2_histogram",
    "grouped_topk_array",
    "pii_pseudonymize",
    "union_schema_drift",
    "observe_metrics",
    "generate_date_dim",
    "sink_parquet_zstd",
    "join_hint_merge",
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
    "monotonicity_audit",
    "share_of_parent",
    "join_fallback_hierarchy",
    "weighted_moving_avg",
    "trimmed_mean_grouped",
    "surrogate_keys",
    "table_fingerprint",
    "session_window_dynamic_gap",
    "feature_minmax_scale",
    "peak_activity_cell",
    "split_leakage_audit",
    "quality_stratified_sample",
    "corpus_jsonl_gz_roundtrip",
    "rolling_distinct_users_7d",
    "session_entropy",
    "percentile_disc_exact",
    "covisitation_timebound",
    "quantile_normalize",
    "funnel_step_deadlines",
    "grouped_ols_2var",
    "daily_crosscorr_lags",
    "revenue_changepoint_fit",
    "inventory_fifo_matching",
    "woe_iv_binning",
    "diff_in_diff",
    "ab_srm_check",
    "largest_remainder_apportionment",
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
    "geo_grid_knn",
    "forecast_backtest_mase",
    "wilson_ci_ranking",
    "seasonal_decompose_additive",
    "ab_sequential_sprt",
    "graph_degree_assortativity",
    "burstiness_interevent",
    "ratio_metric_delta_method",
    "histogram_equi_depth",
    "bayes_beta_binomial",
    "qini_uplift_deciles",
    "dau_mau_stickiness",
    "acf_daily_revenue",
    "herfindahl_concentration",
    "permutation_test_diff",
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
