"""NULL-heavy-input robustness: the representative entries must
execute when ~a third of every nullable column is NULL — the dirty-data
case (failed upstream extracts, optional fields, late-arriving
dimensions) that hits every production pipeline.

The fixture NULLs out value/text/embedding/timestamp/key columns on a
deterministic id-hash so runs are reproducible. The invariant is NO
exception; outputs may legitimately shrink (NULL keys drop from joins,
NULL texts tokenize to nothing) but must stay well-defined.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.sources.registry import load_table

# entries whose semantics are defined over nullable payloads; key-join
# TPC-H analogs are covered by the NULL-key tables too
REPRESENTATIVE = (
    "pricing_summary",
    "cube_pricing_rollup",
    "window_topk_per_group",
    "join_broadcast_dims",
    "range_join_events",
    "asof_join_signup",
    "dedup_exact_content",
    "dedup_minhash_portable",
    "kmv_distinct_portable",
    "global_index_orders",
    "bm25_topk_docs",
    "knn_brute_force",
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
    "text_metrics",
    "mad_outliers_events",
    "funnel_conversion",
    # round-4 families
    "bloom_semijoin_portable",
    "market_basket_rules",
    "grid_neighbor_join",
    "rolling_zscore_events",
    "corpus_datasheet",
    "fold_assignment_leakfree",
    # round-5 session-4 families — NULL value hits the cents casts
    # (decimal of NULL → NULL, skipped by count/sum), NULL event_type
    # makes degenerate strata/labels, NULL ts exercises the composite
    # order keys and calendar spines
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
    # round-5 session-5 families — NULL value/ts/text exercise the
    # day-grain collapses, the NULL-first rank placement in
    # global/grouped_row_index, the ln() guards behind Laplace
    # smoothing, and the regexp counts over NULL text
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

_NULL_EVERY = 3  # ~1/3 of rows get NULLs


def _nullify(df, id_col, cols):
    cond = F.pmod(F.xxhash64(F.col(id_col)), F.lit(_NULL_EVERY)) == 0
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(cond, F.lit(None).cast(df.schema[c].dataType)).otherwise(F.col(c))
        )
    return out


@pytest.fixture(scope="module")
def nullheavy_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("null_sf")
    plans = {
        "region": ("r_regionkey", ()),
        "nation": ("n_nationkey", ()),
        "customer": ("c_custkey", ("c_acctbal", "c_mktsegment")),
        "supplier": ("s_suppkey", ()),
        "part": ("p_partkey", ("p_retailprice", "p_size", "p_name")),
        "orders": ("o_orderkey", ("o_totalprice", "o_orderdate", "o_orderstatus")),
        "lineitem": ("l_orderkey", ("l_quantity", "l_extendedprice", "l_discount")),
        "events": ("event_id", ("value", "event_type", "props")),
        "documents": ("doc_id", ("text", "lang")),
        "embeddings": ("vec_id", ("embedding", "label")),
    }
    for t, (idc, cols) in plans.items():
        _nullify(load_table(spark, sf_dir, t), idc, cols).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_entry_survives_null_heavy_tables(spark, nullheavy_sf_dir, name):
    fn = catalog.entries()[name].fn
    fn(spark, nullheavy_sf_dir).collect()  # invariant: no exception


def test_skyline_oracle_parity_on_null_dimensions(spark, nullheavy_sf_dir):
    """NULL-dimension rows are incomparable and excluded from BOTH
    engines (review finding: SQL NOT EXISTS vacuously KEEPS them while
    the frontier join-back drops them — parity requires the explicit
    filter on both sides). This runs the full differential compare on
    the NULL-heavy tables, not just a no-crash check."""
    from hpv_etl_code_spark.plans.olap_queries import SKYLINE_PARTS_SQL
    from tests.oracle_util import compare

    compare(
        catalog.entries()["skyline_parts"].fn(spark, nullheavy_sf_dir),
        SKYLINE_PARTS_SQL,
        nullheavy_sf_dir,
    )
