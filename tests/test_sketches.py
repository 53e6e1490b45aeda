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


def test_hll_sketches_are_mergeable_across_partitions(spark, sf_dir):
    """The MERGEABLE-sketch contract behind incremental analytics: build
    one HLL sketch per day partition, union the binary sketches, and
    the merged estimate equals the estimate over the raw full range —
    which is what lets a 100 TB pipeline maintain rolling distincts
    from per-partition metadata instead of rescanning history."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    per_day = ev.groupBy(day).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    merged = per_day.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n")
    ).first()
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).first()
    exact = ev.select("user_id").distinct().count()
    assert merged.n == direct.n  # merge-then-estimate ≡ estimate-all
    assert abs(merged.n - exact) <= max(0.05 * exact, 5)
