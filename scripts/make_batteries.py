"""Generate hpv_etl_code_spark/plans/battery_specs.py (VERDICT r6 #1).

For each battery below: introspect every sibling's Spark output columns
(schema analysis only), emit a DuckDB oracle that is the
UNION ALL BY NAME of the siblings' own oracles with identical
entry-tagging + '<sib>__' column prefixing, then VERIFY the battery
end-to-end (Spark vs DuckDB, driver-style canonicalization) at sf0.001
before writing the specs file.

Usage: python scripts/make_batteries.py [--no-verify] [battery ...]
"""

from __future__ import annotations

import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# battery name -> granular sibling entries (each must be oracle-backed).
# Grouped by family so one gate slot certifies one operator family; heavy
# entries (LSH/graph/streaming/ANN-index builds) stay granular on purpose.
BATTERIES: dict[str, tuple[str, ...]] = {
    "tpch_battery_a": (
        "q2_min_cost_supplier", "q4_priority_with_returns", "q7_nation_volume",
        "q8_market_share", "q9_product_profit", "q10_returned_items",
    ),
    "tpch_battery_b": (
        "q11_value_concentration", "q12_priority_by_status",
        "q13_order_count_distribution", "q14_promo_revenue",
        "q15_top_supplier", "q16_supplier_diversity",
    ),
    "tpch_battery_c": (
        "q17_small_quantity_revenue", "q18_large_volume_customers",
        "q19_disjunctive_revenue", "q20_volume_shippers",
        "q21_sole_fault_supplier", "q22_dormant_accounts",
    ),
    "assoc_stats_battery": (
        "spearman_purchase_view", "kendall_tau_daily",
        "pointbiserial_engagement_conversion", "chi_square_independence",
        "mi_event_type_dow", "corr_battery",
    ),
    "robust_stats_battery": (
        "trimmed_mean_cents", "winsorized_mean_cents", "huber_location_cents",
        "mad_outliers_events", "weighted_quantiles_price", "hill_tail_index",
    ),
    "hypothesis_test_battery": (
        "bootstrap_ci_mean", "permutation_test_cents", "ks_test_drift",
        "srm_assignment_check", "ab_power_mde", "conformal_interval_cents",
    ),
    "experiment_battery": (
        "cuped_variance_reduction", "diff_in_diff_cents", "qini_uplift_deciles",
        "touch_attribution", "decile_lift_table", "ols_segment_trend",
    ),
    "mleval_battery": (
        "auc_purchase_score", "pr_curve_deciles", "calibration_bins_brier",
        "ndcg_user_ranking", "target_encoding_loo", "fold_assignment_leakfree",
        "purged_timeseries_cv", "feature_scaling_battery",
    ),
    "timeseries_corr_battery": (
        "acf_daily_cents", "ccf_purchase_view_daily", "durbin_watson_daily",
        "mann_kendall_daily_trend", "cusum_user_cents",
        "burstiness_user_interarrival",
    ),
    "timeseries_model_battery": (
        "holt_linear_trend", "seasonal_decompose_weekly",
        "forecast_backtest_naive", "anomaly_days_seasonal",
        "gapfill_linear_interp", "resample_ffill_hourly",
        "ohlc_daily_bars", "twap_events",
    ),
    "engagement_battery": (
        "dau_wau_stickiness", "weekly_top_movers", "cohort_ltv_curves",
        "user_journey_paths", "event_transition_matrix",
        "conversion_lag_stats", "ewma_user_values",
    ),
    "governance_battery": (
        "k_anonymity_census", "l_diversity_census", "t_closeness_census",
        "dp_noisy_counts", "dow_seasonality_events",
    ),
    "survival_session_battery": (
        "kaplan_meier_userlife", "logrank_test_userlife",
        "sessionize_events", "lateness_profile",
    ),
    "sketch_battery": (
        "cms_frequency_portable", "hll_distinct_portable",
        "hll_sliding_distinct", "kmv_set_algebra_portable",
        "sampled_quantile_portable", "join_size_estimate_cms",
        "equidepth_histogram_prices", "histogram_prices",
    ),
    "layout_ops_battery": (
        "zorder_key_orders", "hilbert_key_orders", "hilbert_prune_stats",
        "zonemap_prune_stats", "compaction_plan_events", "join_skew_report",
    ),
    "io_sampling_battery": (
        "roundtrip_json_events", "roundtrip_orc_events", "roundtrip_csv_events",
        "stratified_sample_events", "weighted_sample_docs",
    ),
    "text_stats_battery": (
        "readability_flesch", "zipf_exponent_tokens", "oov_rate_by_source",
        "token_entropy_by_source", "repetition_scores", "split_documents",
        "explode_token_counts",
    ),
    "text_search_battery": (
        "tfidf_terms", "pmi_token_pairs", "phrase_search_docs",
        "string_agg_segments", "text_pii_scrub", "chunk_dedup_ratio",
    ),
    "concentration_battery": (
        "gini_customer_revenue", "lorenz_revenue_deciles",
        "hhi_segment_concentration", "benford_digit_profile",
        "abc_classification_parts", "abc_by_segment",
        "quantile_normalize_sources",
    ),
    "sql_surface_battery": (
        "window_cumulative_distinct", "lateral_topk_orders", "pivot_multi_agg",
        "stack_unpivot_part", "posexplode_map_battery", "percentile_battery",
        "null_funcs_battery", "regex_funcs_battery",
    ),
    "json_graph_battery": (
        "json_variant_events", "variant_extract_events",
        "recursive_ancestor_depth", "bfs_hops_copurchase",
        "interval_containment_join", "interval_union_length",
    ),
    "corpus_ops_battery": (
        "corpus_epoch_shuffle", "corpus_mixture_sample", "sequence_packing",
        "negative_samples_per_user", "fd_profile_lineitem", "per_group_trend",
    ),
    "image_battery": (
        "image_ahash_fingerprint", "image_dedup_ahash", "image_thumbnail_resize",
    ),
}

_IDENT_OK = set("abcdefghijklmnopqrstuvwxyz0123456789_")


def _ref(col: str) -> str:
    return col if set(col.lower()) <= _IDENT_OK else f'"{col}"'


def _branch_col(c: str, spark_type: str, sib: str) -> str:
    """Mirror plans/family_batteries._norm: bool -> INT, date -> VARCHAR
    (NULL-padding-stable through the driver's pandas canonicalizer)."""
    if spark_type == "boolean":
        return f'CAST({_ref(c)} AS INTEGER) AS "{sib}__{c}"'
    if spark_type == "date":
        return f'CAST({_ref(c)} AS VARCHAR) AS "{sib}__{c}"'
    return f'{_ref(c)} AS "{sib}__{c}"'


def build_oracle(siblings, sib_cols, sib_sql) -> str:
    branches = []
    for sib in siblings:
        cols = ", ".join(
            _branch_col(c, t, sib) for c, t in sib_cols[sib]
        )
        sql = sib_sql[sib].strip().rstrip(";")
        branches.append(
            f"SELECT '{sib}' AS entry, {cols} FROM (\n{sql}\n)"
        )
    return "\nUNION ALL BY NAME\n".join(branches)


def main() -> int:
    args = sys.argv[1:]
    verify = "--no-verify" not in args
    only = {a for a in args if not a.startswith("--")}

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make-batteries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hpv_etl_code_spark import catalog

    es = catalog.entries()
    specs: dict[str, dict] = {}
    failures = []
    for name, siblings in BATTERIES.items():
        if only and name not in only:
            continue
        missing = [s for s in siblings if s not in es]
        no_oracle = [s for s in siblings if s in es and es[s].oracle is None]
        if missing or no_oracle:
            failures.append((name, f"missing={missing} no_oracle={no_oracle}"))
            continue
        sib_cols = {}
        for s in siblings:
            sib_cols[s] = es[s].fn(spark, SF_DIR).dtypes
        oracle = build_oracle(siblings, sib_cols, {s: es[s].oracle for s in siblings})
        specs[name] = {"siblings": list(siblings), "oracle": oracle}
        print(f"{name}: {len(siblings)} siblings, "
              f"{sum(len(v) for v in sib_cols.values())} prefixed cols")

    if verify and specs:
        from functools import reduce

        import duckdb
        from pyspark.sql import functions as F

        sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
        from driver_emulation import TABLES, _canon

        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
        from hpv_etl_code_spark.plans.family_batteries import _norm

        for name, spec in specs.items():
            dfs = []
            for sib in spec["siblings"]:
                df = es[sib].fn(spark, SF_DIR)
                dfs.append(df.select(
                    F.lit(sib).alias("entry"),
                    *[_norm(df, c).alias(f"{sib}__{c}") for c in df.columns],
                ))
            got_df = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
            )
            try:
                got = _canon(got_df.toPandas())
                want = _canon(con.sql(spec["oracle"]).df())
            except Exception as exc:  # noqa: BLE001 — report and continue
                failures.append((name, f"{type(exc).__name__}: {exc}"))
                print(f"  {name}: ERROR {exc}")
                continue
            if sorted(c.lower() for c in got.columns) != sorted(
                c.lower() for c in want.columns
            ):
                failures.append((name, "column mismatch"))
                print(f"  {name}: COLUMN MISMATCH")
            elif len(got) != len(want):
                failures.append((name, f"rows {len(got)} vs {len(want)}"))
                print(f"  {name}: ROW MISMATCH {len(got)} vs {len(want)}")
            elif not got.reset_index(drop=True).equals(want.reset_index(drop=True)):
                neq = (got.values != want.values)
                bad_cols = [got.columns[j] for j in range(got.shape[1]) if neq[:, j].any()]
                failures.append((name, f"values differ in {bad_cols[:5]}"))
                print(f"  {name}: VALUE MISMATCH in {bad_cols[:5]}")
            else:
                print(f"  {name}: OK ({len(got)} rows)")

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1

    if only:
        print("partial run — specs file NOT written (run without names)")
        return 0

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hpv_etl_code_spark", "plans", "battery_specs.py",
    )
    with open(out, "w") as fh:
        fh.write('"""GENERATED by scripts/make_batteries.py — do not edit by hand.\n\n'
                 "Each battery: {\"siblings\": [granular entry names], \"oracle\": SQL}\n"
                 "where the oracle is the UNION ALL BY NAME of the siblings' own\n"
                 "oracle SQL, each branch tagged entry='<sibling>' and columns\n"
                 "prefixed '<sibling>__' (see plans/family_batteries.py).\n"
                 '"""\n\nfrom __future__ import annotations\n\n'
                 "BATTERY_SPECS: dict[str, dict] = ")
        fh.write(pprint.pformat(specs, width=78, sort_dicts=False))
        fh.write("\n")
    print(f"\nwrote {out} ({len(specs)} batteries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
