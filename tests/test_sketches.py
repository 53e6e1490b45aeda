"""Error-bound tests for the sketch aggregates (the rows-only catalog
entry `approx_sketches`): the approximations must land within their
published error envelopes of the exact twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.sources.registry import load_table


def test_hll_count_distinct_within_error_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: (r.approx_n, r.exact_n)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_n"),
            F.count_distinct("l_orderkey").alias("exact_n"),
        )
        .collect()
    }
    assert got
    for flag, (approx_n, exact_n) in got.items():
        # default rsd is 5%; allow 3 sigma
        assert abs(approx_n - exact_n) <= max(0.15 * exact_n, 5), (flag, got)


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5).alias("approx_med"),
            F.percentile("l_quantity", 0.5).alias("exact_med"),
            F.min("l_quantity").alias("lo"),
            F.max("l_quantity").alias("hi"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r.lo <= r.approx_med <= r.hi
        # quantities span 1..50; the default accuracy (1/10000 rank
        # error) keeps the approximate median within a couple of units
        assert abs(r.approx_med - r.exact_med) <= 2
