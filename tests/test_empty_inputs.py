"""Empty-input robustness: every representative catalog entry must
plan and execute against ZERO-ROW tables without raising — the
degenerate case every production backfill eventually hits (an empty
partition, a filtered-out day, a brand-new tenant).

The fixture writes schema-correct empty parquet for all ten tables;
entries are expected to return an empty (or defined-degenerate) result,
never to throw. Divide-by-zero, NULL bounds from min/max over nothing,
empty broadcast sides and empty window partitions are exactly the seams
this exercises.
"""

from __future__ import annotations

import pytest

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.sources.registry import load_table

# a cross-section of plan shapes: aggregation, grouping sets, windows,
# joins (broadcast + shuffle), banded joins, dedup/LSH, sketches,
# layout, retrieval, stats, vectors, reshaping
REPRESENTATIVE = (
    "pricing_summary",
    "cube_pricing_rollup",
    "window_topk_per_group",
    "join_broadcast_dims",
    "join_fact_fact",
    "range_join_events",
    "asof_join_signup",
    "dedup_exact_content",
    "dedup_minhash_portable",
    "kmv_distinct_portable",
    "kmv_set_algebra_portable",
    "cms_frequency_portable",
    "global_index_orders",
    "bm25_topk_docs",
    "hybrid_rrf_docs",
    "knn_brute_force",
    "knn_graph",
    "skyline_parts",
    "bitmap_distinct_events",
    "twap_events",
    "ab_welch_ttest",
    "psi_value_drift",
    "interval_union_length",
    "sessionize_events",
    "user_journey_paths",
    "sampled_quantile_portable",
    "feature_scaling_battery",
    "incremental_matview_orders",
    "unpivot_part",
    "merge_upsert_orders",
    "setop_union_distinct",
    "scalar_subquery_above_avg",
    "q3_shipping_priority",
    # round-4 families
    "bloom_semijoin_portable",
    "market_basket_rules",
    "grid_neighbor_join",
    "rolling_zscore_events",
    "corpus_datasheet",
    "fold_assignment_leakfree",
    "dedup_minhash_lsh",
    "dedup_incremental_fast",
    # round-5 session-4 families: survival, time-series, inference,
    # ML eval — empty inputs hit the v>0 / n>1 guards, the empty-maps
    # coalesce in the Holt fold, and the no-full-window filter in the
    # seasonal decomposition
    "kaplan_meier_userlife",
    "logrank_test_userlife",
    "acf_daily_cents",
    "gapfill_linear_interp",
    "holt_linear_trend",
    "seasonal_decompose_weekly",
    "chi_square_independence",
    "permutation_test_cents",
    "pr_curve_deciles",
    "calibration_bins_brier",
    "conformal_interval_cents",
    # round-6 families: wedge-sampled transitivity (NULL wedge total →
    # empty sample set survives the banded join), artifact-backed
    # cluster sizes, JPEG codec entries (0-row map stages), perplexity
    # bands (global_row_index over zero rows), the funnel report
    # (empty total never divides), and the streaming executions
    # (availableNow over an empty source drains cleanly)
    "clustering_coefficient_sampled",
    "dedup_cluster_sizes_indexed",
    "jpeg_coeff_roundtrip",
    "jpeg_dc_pixel_stats",
    "unigram_ce_bands",
    "filter_funnel_report",
    "ab_stats_stream",
    # round-5 session-5 families: robust stats, concentration, drift,
    # text diagnostics, calibration — empty inputs hit the rank-median
    # selection over zero pairs, the NULL min/max bounds through
    # global/grouped_row_index, the Laplace smoothing over empty bins
    # and the empty top-k frames
    "theil_sen_daily_trend",
    "mann_kendall_daily_trend",
    "ab_power_mde",
    "js_divergence_drift",
    "mi_event_type_dow",
    "gini_customer_revenue",
    "lorenz_revenue_deciles",
    "hhi_segment_concentration",
    "burstiness_user_interarrival",
    "ccf_purchase_view_daily",
    "rfm_segments",
    "bpe_merge_candidates",
    "zipf_exponent_tokens",
    "readability_flesch",
    "transition_entropy",
    "durbin_watson_daily",
    "isotonic_calibration_pav",
    "weighted_median_price",
    "huber_location_cents",
    "cohort_ltv_curves",
    "dp_noisy_counts",
    "spearman_purchase_view",
    "kendall_tau_daily",
    "ohlc_daily_bars",
    "hill_tail_index",
    "abc_classification_parts",
    "negative_samples_per_user",
    "anomaly_days_seasonal",
    "weighted_quantiles_price",
    "qini_uplift_deciles",
    "degree_assortativity_copurchase",
    "clustering_coefficient_copurchase",
    "winsorized_mean_cents",
    "forecast_backtest_naive",
    "dedup_cluster_sizes",
    "pointbiserial_engagement_conversion",
    "abc_by_segment",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        load_table(spark, sf_dir, t).limit(0).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_entry_survives_empty_tables(spark, empty_sf_dir, name):
    fn = catalog.entries()[name].fn
    rows = fn(spark, empty_sf_dir).collect()
    # empty input → empty or defined-degenerate output; the invariant
    # under test is NO exception, but also bound the output size so a
    # literal-generating bug can't fabricate data from nothing
    assert len(rows) <= 20, (name, rows[:5])
