"""Targeted >10x oracle sweep — the scale-fragile families (VERDICT r06
item 3). The four sf1 catches (window-tie nondeterminism, int64 hash
overflow, money-sum ULP, stateful chunk order) all had the shape
"invisible below some scale", so the families they live in get one more
decade of oracle verification: 30-copy /tmp/drs_sf3 (= TPC-H sf3, 3x the
sf1 sweep, 30x the bench scale), full driver comparator.

    SPARK_GRAFT_SF1_DIR=/tmp/drs_sf3 SPARK_GRAFT_SCALE_COPIES=30 \
        python tools/scale_probe.py --build-only
    SPARK_GRAFT_LOCAL_SF_DIR=/tmp/drs_sf3 \
        SPARK_GRAFT_LOCAL_OUT=CORRECTNESS_sf3.json \
        SPARK_GRAFT_LOCAL_ONLY=$(python tools/sf3_families.py) \
        python correctness_local.py

Excluded by design: the quadratic recursive-closure oracles
(dedup_clusters, dedup_fuzzy_clusters — SIGMA K^2 reach rows; the sf1
sweep already value-checked them and their cluster structure is
per-copy, so sf3 adds copies of the same components, not larger ones)
and hierarchy_closure_recursive (nation-dim sized — scale-invariant).
"""

from __future__ import annotations

FAMILIES: dict[str, list[str]] = {
    # ROUND(x,6) / DECIMAL / ULP surface — the money-sum catch's family
    "float_surface": [
        "observe_metrics", "decimal_money_suite", "eval_metrics",
        "global_stats", "grouped_ols_2var", "trend_linear_fit",
        "time_weighted_avg", "revenue_changepoint_fit",
        "seasonal_decompose_additive", "acf_daily_revenue",
        "daily_crosscorr_lags", "ratio_metric_delta_method",
        "herfindahl_concentration", "expected_calibration_error",
        "ab_cuped_adjustment", "spearman_corr_grouped", "cramers_v_matrix",
        "net_revenue_retention", "price_volume_mix_bridge",
        "forecast_backtest_mase", "user_ewma", "quantile_normalize",
        "rolling_zscore", "anomaly_zscore", "trimmed_mean_grouped",
        "weighted_median_grouped", "grouped_median_mad",
        "grouped_skew_kurtosis",
    ],
    # windowed sums / rank windows keyed on interaction_id or ts — the
    # window-tie catch's family
    "windowed_sum": [
        "window_functions_suite", "nth_value_suite", "dedup_keep_last",
        "sort_by_time", "split_train_test", "split_train_test_temporal",
        "split_kfold", "window_range_rolling", "rolling_trend_window",
        "rolling_distinct_users_7d", "cumulative_unique_users",
        "events_since_purchase", "gaps_islands", "sessionize",
        "session_window_native", "session_window_dynamic_gap",
        "timeseries_interpolate_linear", "timeseries_resample",
        "window_events_tumbling", "window_events_sliding",
        "funnel_within_window", "weighted_moving_avg",
        "running_compound_growth", "mann_kendall_trend",
    ],
    # carried-state recurrences, batch + streaming twins — the
    # chunk-order catch's family (recursion depth is per-key and the
    # key domain grows by copies, so the recursive oracles stay linear)
    "stateful": [
        "stream_bin_pack", "stream_queue_lindley", "stream_rate_limit",
        "stream_hysteresis_alerts", "stream_cdc_upsert",
        "stream_sessionize", "stream_dedup", "stream_session_window",
        "stream_slo_burn", "stream_dau_daily", "stream_cart_abandonment",
        "stream_update_mode", "stream_daily_unique_users",
        "bin_pack_next_fit", "queue_lindley_wait",
        "rate_limit_token_bucket", "hysteresis_alert_flags",
        "event_rate_cusum", "inventory_fifo_matching", "event_debounce",
        "holt_linear_forecast", "holt_winters_additive",
    ],
    # multiplicative hashes / block-offset global ranks over the 60-bit
    # id domain — the int64-overflow catch's family
    "block_offset_hash": [
        "dedup_sorted_neighborhood", "vocab_coverage",
        "consistent_hash_assignment", "pii_pseudonymize",
        "surrogate_keys", "table_fingerprint", "feature_hashing",
        "dedup_minhash", "winnowing_fingerprint", "text_fingerprint",
        "minhash_band_sweep", "bloom_fpr_audit", "user_segment_bitmaps",
        "heavy_hitters", "countmin_sketch_rollup",
        "stream_countmin_rollup", "percentile_disc_exact",
        "histogram_equi_depth", "event_lateness_profile",
    ],
}


def all_names() -> list[str]:
    seen: list[str] = []
    for fam in FAMILIES.values():
        for n in fam:
            if n not in seen:
                seen.append(n)
    return seen


if __name__ == "__main__":
    print(",".join(all_names()))
