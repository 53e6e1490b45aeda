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
