"""Semantic invariants for the robust-statistics entries
(plans/robust_queries.py) beyond the differential oracle gate:
mathematical bounds each statistic must satisfy on ANY input."""

from __future__ import annotations

import math

from hpv_etl_code_spark.plans import robust_queries as rq


def test_theil_sen_pair_count_and_finiteness(spark, sf_dir):
    row = rq.theil_sen_daily_trend(spark, sf_dir).collect()[0]
    # m = C(n_days, 2) exactly — every day pair contributes one slope
    assert row.n_pairs == row.n_days * (row.n_days - 1) // 2
    assert math.isfinite(row.slope_cents_per_day)
    assert math.isfinite(row.intercept_cents)


def test_ab_power_mde_bounds(spark, sf_dir):
    row = rq.ab_power_mde(spark, sf_dir).collect()[0]
    assert row.n0 > 0 and row.n1 > 0
    assert row.sd_pooled > 0
    assert row.mde_cents > 0
    # MDE shrinks with traffic: must be far below the pooled sd itself
    # for any non-trivial n (factor (z sum)·sqrt(1/n0+1/n1) < 1 when
    # both arms have > ~32 users)
    if min(row.n0, row.n1) > 32:
        assert row.mde_cents < row.sd_pooled


def test_js_divergence_bounds(spark, sf_dir):
    rows = {r.bucket: r for r in rq.js_divergence_drift(spark, sf_dir).collect()}
    total = rows.pop(-1)
    # JSD in nats is bounded by ln 2 and non-negative
    assert 0.0 <= total.js_term <= math.log(2) + 1e-9
    # the TOTAL row aggregates the per-bucket counts exactly
    assert total.n_a == sum(r.n_a for r in rows.values())
    assert total.n_b == sum(r.n_b for r in rows.values())
    # per-bucket terms are each non-negative (JS is a sum of KLs to the
    # midpoint) up to the 6dp rounding
    assert all(r.js_term >= -1e-6 for r in rows.values())


def test_gini_bounds_and_uniform_zero(spark, sf_dir):
    row = rq.gini_customer_revenue(spark, sf_dir).collect()[0]
    assert 0.0 <= row.gini < 1.0
    # a perfectly uniform distribution has Gini == (n-1)/n - ... == 0
    # via the rank formula: check on a synthetic 4-row frame
    df = spark.createDataFrame(
        [(i, 100.0) for i in range(1, 5)], "o_custkey long, o_totalprice double"
    )
    df.createOrReplaceTempView("__uniform_orders")
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.operators.layout import global_row_index

    per = df.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    idx = global_row_index(per, key="cents", tiebreak=("o_custkey",), index_col="i")
    r = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("t"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")).alias("ic"),
    ).collect()[0]
    gini = (2 * int(r.ic) - (r.n + 1) * r.t) / (r.n * r.t)
    assert gini == 0.0


def test_ccf_bounds_and_pair_counts(spark, sf_dir):
    from hpv_etl_code_spark.plans.timeseries_queries import (
        ccf_purchase_view_daily,
    )

    rows = {r.lag: r for r in ccf_purchase_view_daily(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(8))
    n = rows[0].n_pairs
    for k, r in rows.items():
        # dense calendar axis → exactly n−k aligned pairs at lag k
        assert r.n_pairs == n - k
        assert -1.0 - 1e-9 <= r.ccf <= 1.0 + 1e-9


def test_rfm_segments_partition_customers(spark, sf_dir):
    from hpv_etl_code_spark.plans.behavior_queries import rfm_segments
    from hpv_etl_code_spark.sources.registry import load_table

    rows = rfm_segments(spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
        assert r.avg_monetary_cents > 0


def test_bpe_merge_candidates_shape(spark, sf_dir):
    import re

    from hpv_etl_code_spark.plans.text_queries import bpe_merge_candidates

    rows = sorted(bpe_merge_candidates(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= 20
    # counts non-increasing in rank; every pair is two ascii letters
    for prev, cur in zip(rows, rows[1:]):
        assert prev.n_occurrences >= cur.n_occurrences
    assert all(re.fullmatch(r"[a-z]{2}", r.pair) for r in rows)


def test_isotonic_fit_is_monotone_and_mass_preserving(spark, sf_dir):
    from hpv_etl_code_spark.plans.mleval_queries import isotonic_calibration_pav

    rows = sorted(
        isotonic_calibration_pav(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # PAV output is non-decreasing by construction
    for prev, cur in zip(rows, rows[1:]):
        assert prev.fit_rate <= cur.fit_rate + 1e-9
    # pooled-mean preservation: Σ fit·n == Σ pos (up to 6dp rounding)
    fitted_mass = sum(r.fit_rate * r.n_rows for r in rows)
    true_mass = sum(r.n_pos for r in rows)
    assert abs(fitted_mass - true_mass) < 1e-4 * true_mass + 1.0
    # all fits live in [0, 1]
    assert all(0.0 <= r.fit_rate <= 1.0 for r in rows)


def test_mann_kendall_consistent_with_pair_count(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import mann_kendall_daily_trend

    row = mann_kendall_daily_trend(spark, sf_dir).collect()[0]
    max_pairs = row.n_days * (row.n_days - 1) // 2
    assert -max_pairs <= row.s_stat <= max_pairs
    assert row.var_s > 0
    assert row.significant == (abs(row.z) > 1.959964)


def test_mutual_information_nonnegative_total(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import mi_event_type_dow

    rows = mi_event_type_dow(spark, sf_dir).collect()
    total = [r for r in rows if r.event_type == "TOTAL"][0]
    cells = [r for r in rows if r.event_type != "TOTAL"]
    # MI ≥ 0 always (it's a KL divergence); cell terms can be negative
    assert total.mi_term >= -1e-6
    assert total.n == sum(r.n for r in cells)


def test_lorenz_matches_gini_and_sums_to_one(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import (
        gini_customer_revenue,
        lorenz_revenue_deciles,
    )

    rows = sorted(
        lorenz_revenue_deciles(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    # ascending-revenue deciles → shares non-decreasing
    for prev, cur in zip(rows, rows[1:]):
        assert prev.share <= cur.share + 1e-9
    # cross-check: Gini ≈ 1 − 2·∫Lorenz (trapezoid over the decile grid,
    # coarse — 10 buckets ≈ within a few points of the exact rank Gini)
    gini = gini_customer_revenue(spark, sf_dir).collect()[0].gini
    cum = [0.0] + [r.cum_share for r in rows]
    area = sum((cum[i] + cum[i + 1]) / 2 * 0.1 for i in range(10))
    assert abs(gini - (1 - 2 * area)) < 0.05


def test_flesch_counts_consistent(spark, sf_dir):
    from hpv_etl_code_spark.plans.text_queries import readability_flesch

    rows = readability_flesch(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert r.n_words >= 1 and r.n_sentences >= 1
        # recompute the score from the reported counts
        expect = 206.835 - 1.015 * (r.n_words / r.n_sentences) - 84.6 * (
            r.n_syllables / r.n_words
        )
        assert abs(r.flesch_score - expect) < 1e-5


def test_zipf_slope_is_negative(spark, sf_dir):
    from hpv_etl_code_spark.plans.text_queries import zipf_exponent_tokens

    row = zipf_exponent_tokens(spark, sf_dir).collect()[0]
    assert row.n_tokens > 10
    # frequency must fall with rank — slope strictly negative — and a
    # token distribution can't decay faster than heavy exponential
    assert -10.0 < row.zipf_slope < 0.0


def test_transition_entropy_bounds(spark, sf_dir):
    import math

    from hpv_etl_code_spark.plans.behavior_queries import transition_entropy
    from hpv_etl_code_spark.sources.registry import load_table

    rows = transition_entropy(spark, sf_dir).collect()
    total = [r for r in rows if r.event_type == "TOTAL"][0]
    states = [r for r in rows if r.event_type != "TOTAL"]
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    # conditional entropy ∈ [0, ln |types|]
    assert -1e-6 <= total.entropy_term <= math.log(n_types) + 1e-6
    # TOTAL term is the sum of per-state terms (same decimal-summed set)
    assert abs(total.entropy_term - sum(r.entropy_term for r in states)) < 1e-4
    assert total.n_out == sum(r.n_out for r in states)


def test_durbin_watson_range(spark, sf_dir):
    from hpv_etl_code_spark.plans.timeseries_queries import durbin_watson_daily

    row = durbin_watson_daily(spark, sf_dir).collect()[0]
    assert 0.0 <= row.durbin_watson <= 4.0
    assert row.n_days > 2


def test_hhi_bounds(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import hhi_segment_concentration

    rows = hhi_segment_concentration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI ∈ (10000/n, 10000]: equals 10000/n when all equal, 10000 for a monopoly
        assert 10000.0 / r.n_customers - 1e-6 <= r.hhi_points <= 10000.0 + 1e-6


def test_weighted_median_between_min_and_max(spark, sf_dir):
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.plans.robust_queries import weighted_median_price
    from hpv_etl_code_spark.sources.registry import load_table

    row = weighted_median_price(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    ).collect()[0]
    assert b.lo * 100 <= row.weighted_median_cents <= b.hi * 100
    # cross-check against a driver-side computation on sorted pairs
    pairs = sorted(
        (int(round(r.l_extendedprice * 100)), int(r.l_quantity))
        for r in li.select("l_extendedprice", "l_quantity").collect()
    )
    total = sum(q for _, q in pairs)
    cum = 0
    for cents, q in pairs:
        cum += q
        if 2 * cum >= total:
            assert row.weighted_median_cents == cents
            break


def test_weighted_quantiles_monotone_and_median_consistent(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import (
        weighted_median_price,
        weighted_quantiles_price,
    )

    q = {
        r.quartile: r.quantile_cents
        for r in weighted_quantiles_price(spark, sf_dir).collect()
    }
    assert sorted(q) == [1, 2, 3]
    assert q[1] <= q[2] <= q[3]
    med = weighted_median_price(spark, sf_dir).collect()[0]
    # p50 of the quartile entry is the weighted median by construction
    assert q[2] == med.weighted_median_cents


def test_huber_between_median_and_mean_pull(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import huber_location_cents

    row = huber_location_cents(spark, sf_dir).collect()[0]
    assert row.huber_c > 0
    # each IRLS step stays inside the data range and near the center:
    # between median and median ± c is a loose but always-true envelope
    for mu in (row.mu_step1, row.mu_step2):
        assert row.median_cents - row.huber_c <= mu <= row.median_cents + row.huber_c


def test_cohort_ltv_monotone_in_age(spark, sf_dir):
    from collections import defaultdict

    from hpv_etl_code_spark.plans.behavior_queries import cohort_ltv_curves

    rows = cohort_ltv_curves(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        assert r.age >= 0 and r.period_cents > 0
        by_cohort[r.cohort].append((r.age, r.cum_avg_ltv_cents))
    # cumulative LTV never decreases with age within a cohort
    for series in by_cohort.values():
        series.sort()
        for (_, a), (_, b) in zip(series, series[1:]):
            assert b >= a - 1e-6


def test_dp_noisy_counts_mechanism(spark, sf_dir):
    import math

    from hpv_etl_code_spark.plans.governance_queries import dp_noisy_counts

    rows = dp_noisy_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.epsilon == 1.0
        # released = true + noise exactly (up to 6dp rounding of both)
        assert abs(r.n_released - (r.n_true + r.laplace_noise)) < 2e-6
        # Laplace(b=1) draws essentially never exceed |40| (CDF tail
        # e^-40); the inverse-CDF map must stay in sane range
        assert abs(r.laplace_noise) < 40.0


def test_spearman_kendall_agree_in_sign_and_bounds(spark, sf_dir):
    from hpv_etl_code_spark.plans.timeseries_queries import (
        kendall_tau_daily,
        spearman_purchase_view,
    )

    rho = spearman_purchase_view(spark, sf_dir).collect()[0]
    tau = kendall_tau_daily(spark, sf_dir).collect()[0]
    assert -1.0 - 1e-9 <= rho.spearman_rho <= 1.0 + 1e-9
    assert -1.0 - 1e-9 <= tau.kendall_tau_b <= 1.0 + 1e-9
    assert tau.n_pairs == rho.n_days * (rho.n_days - 1) // 2
    assert tau.concordant + tau.discordant <= tau.n_pairs
    # both measure monotone association on the same series — when one
    # is decisively signed the other must not be decisively opposite
    if abs(rho.spearman_rho) > 0.2:
        assert rho.spearman_rho * tau.kendall_tau_b >= -1e-6


def test_ohlc_bars_internally_consistent(spark, sf_dir):
    from hpv_etl_code_spark.plans.timeseries_queries import ohlc_daily_bars

    rows = ohlc_daily_bars(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        assert r.n_events >= 1


def test_hill_alpha_positive(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import hill_tail_index

    row = hill_tail_index(spark, sf_dir).collect()[0]
    assert row.k == 100
    assert row.threshold_cents > 0
    # revenues above the threshold → every log term > 0 → α > 0
    assert row.hill_alpha > 0


def test_abc_partitions_parts_and_shares(spark, sf_dir):
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.plans.robust_queries import abc_classification_parts
    from hpv_etl_code_spark.sources.registry import load_table

    rows = {r.abc_class: r for r in abc_classification_parts(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    n_parts = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-5
    # Pareto shape: A holds ≥ its 80% of revenue with < 80% of parts
    assert rows["A"].revenue_share <= 0.8 + 1e-6
    assert rows["A"].n_parts < 0.8 * n_parts


def test_negative_samples_never_positive(spark, sf_dir):
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.plans.packing_queries import (
        negative_samples_per_user,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    neg = negative_samples_per_user(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    purchased = (
        orders.select("o_orderkey", "o_custkey")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", F.col("l_partkey").alias("candidate_partkey"))
        .distinct()
    )
    # no sampled negative may be an actual purchase
    assert neg.join(purchased, ["o_custkey", "candidate_partkey"]).count() == 0
    # at most k per customer, candidate keys inside the part key space
    per = neg.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert per <= 5
    pmax = load_table(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0]
    bad = neg.filter(
        (F.col("candidate_partkey") < 0) | (F.col("candidate_partkey") > pmax)
    ).count()
    assert bad == 0


def test_anomaly_days_residuals_center_and_flag_rule(spark, sf_dir):
    import math

    from hpv_etl_code_spark.plans.timeseries_queries import anomaly_days_seasonal

    rows = anomaly_days_seasonal(spark, sf_dir).collect()
    assert rows
    # residuals of a per-group mean removal sum to ~0
    assert abs(sum(r.residual_cents for r in rows)) < 1e-2 * len(rows) + 1.0
    # the flag is consistent with the 3-sigma rule recomputed here
    n = len(rows)
    s = sum(r.residual_cents for r in rows)
    q = sum(r.residual_cents**2 for r in rows)
    sigma = math.sqrt(max(n * q - s * s, 0.0)) / n
    for r in rows:
        assert r.is_anomaly == (abs(r.residual_cents) > 3.0 * sigma) or (
            abs(abs(r.residual_cents) - 3.0 * sigma) < 1e-3
        )


def test_qini_deciles_partition_users(spark, sf_dir):
    from hpv_etl_code_spark.plans.inference_queries import qini_uplift_deciles
    from hpv_etl_code_spark.sources.registry import load_table

    rows = sorted(
        qini_uplift_deciles(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_t + r.n_c for r in rows) == n_users
    for r in rows:
        assert 0 <= r.o_t <= r.n_t and 0 <= r.o_c <= r.n_c
        if r.uplift is not None:
            assert -1.0 - 1e-9 <= r.uplift <= 1.0 + 1e-9


def test_graph_health_panel_bounds(spark, sf_dir):
    from hpv_etl_code_spark.plans.temporal_graph_queries import (
        clustering_coefficient_copurchase,
        degree_assortativity_copurchase,
    )

    r = degree_assortativity_copurchase(spark, sf_dir).collect()[0]
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    assert r.n_edges > 0 and r.n_vertices > 0

    c = clustering_coefficient_copurchase(spark, sf_dir).collect()[0]
    assert 0.0 <= c.clustering_coefficient <= 1.0 + 1e-9
    # every triangle closes exactly three wedges
    assert 3 * c.n_triangles <= c.n_wedges


def test_winsorized_mean_between_trimmed_and_raw_extremes(spark, sf_dir):
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.plans.stats_queries import winsorized_mean_cents
    from hpv_etl_code_spark.sources.registry import load_table

    rows = {r.event_type: r for r in winsorized_mean_cents(spark, sf_dir).collect()}
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("c"),
    )
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
        .collect()
    }
    for t, r in rows.items():
        lo, hi = bounds[t]
        # clamping can never move the mean outside the raw value range
        assert lo <= r.winsorized_mean_cents <= hi
        assert r.n_total > 0


def test_forecast_backtest_shape(spark, sf_dir):
    from hpv_etl_code_spark.plans.timeseries_queries import (
        forecast_backtest_naive,
    )

    rows = {r.model: r for r in forecast_backtest_naive(spark, sf_dir).collect()}
    assert set(rows) == {"naive", "seasonal_naive"}
    for r in rows.values():
        assert r.n_days == 14
        assert r.mape >= 0 and r.rmse_cents >= 0


def test_dedup_cluster_sizes_consistent_with_components(spark, sf_dir):
    from hpv_etl_code_spark.plans.text_queries import (
        dedup_cluster_sizes,
        dedup_components_portable,
    )

    rows = dedup_cluster_sizes(spark, sf_dir).collect()
    assert rows
    comps = dedup_components_portable(spark, sf_dir)
    # every clustered doc is accounted for exactly once
    assert sum(r.n_docs for r in rows) == comps.count()
    assert sum(r.n_clusters for r in rows) == comps.select("component").distinct().count()
    for r in rows:
        assert r.cluster_size >= 2  # singletons never enter the pair graph
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_pointbiserial_bounds(spark, sf_dir):
    from hpv_etl_code_spark.plans.robust_queries import (
        pointbiserial_engagement_conversion,
    )

    row = pointbiserial_engagement_conversion(spark, sf_dir).collect()[0]
    assert 0 <= row.n_converted <= row.n_users
    if row.pointbiserial_r is not None:
        assert -1.0 - 1e-9 <= row.pointbiserial_r <= 1.0 + 1e-9
        # sign agrees with the group-mean difference
        diff = row.mean_events_converted - row.mean_events_not
        assert row.pointbiserial_r * diff >= -1e-9


def test_abc_by_segment_partitions_each_segment(spark, sf_dir):
    from collections import defaultdict

    from hpv_etl_code_spark.plans.robust_queries import abc_by_segment

    rows = abc_by_segment(spark, sf_dir).collect()
    by_seg = defaultdict(dict)
    for r in rows:
        by_seg[r.segment][r.abc_class] = r
    for seg, classes in by_seg.items():
        assert "A" in classes
        shares = sum(r.revenue_share for r in classes.values())
        assert abs(shares - 1.0) < 1e-5, seg
        # per-segment Pareto: A's revenue share caps at the 80% cut
        assert classes["A"].revenue_share <= 0.8 + 1e-6


def test_burstiness_bounds(spark, sf_dir):
    rows = rq.burstiness_user_interarrival(spark, sf_dir).collect()
    assert rows, "expected at least one user with >= 2 gaps"
    for r in rows:
        assert r.n_gaps >= 2
        assert r.mean_gap_s >= 0
        assert r.sd_gap_s >= 0
        # B = (σ−μ)/(σ+μ) ∈ [−1, 1] whenever σ+μ > 0
        if r.sd_gap_s + r.mean_gap_s > 0:
            assert -1.0 - 1e-9 <= r.burstiness <= 1.0 + 1e-9
