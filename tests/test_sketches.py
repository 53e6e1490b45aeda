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


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    """KMV(k=64) standard error is ~1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    against the exact distinct count per group."""
    from hpv_etl_code_spark.plans.battery_queries import kmv_distinct_portable

    got = {
        r.l_returnflag: r.est_distinct
        for r in kmv_distinct_portable(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact) and got
    for flag, est in got.items():
        n = exact[flag]
        if n < 64:
            assert est == n, (flag, est, n)  # below k the sketch is exact
        else:
            assert abs(est - n) <= max(4 * 0.127 * n, 5), (flag, est, n)


def test_kmv_minima_merge_across_partitions(spark, sf_dir):
    """KMV's mergeable-sketch contract, verified exactly (no estimator
    tolerance needed): the k smallest hashes of a union equal the k
    smallest of the union of per-partition k-minima sets — so per-day
    sketches of k·8 bytes merge into the same state a full rescan
    builds."""
    k = 8  # small k so per-day truncation actually discards hashes
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = ev.select(F.date_trunc("day", "ts").alias("day"), h.alias("h")).distinct()
    from pyspark.sql import Window

    per_day = (
        hashed.withColumn(
            "rn", F.row_number().over(Window.partitionBy("day").orderBy("h"))
        )
        .filter(F.col("rn") <= k)
        .select("h")
        .distinct()
    )
    merged = [r.h for r in per_day.orderBy("h").limit(k).collect()]
    direct = [
        r.h
        for r in hashed.select("h").distinct().orderBy("h").limit(k).collect()
    ]
    assert merged == direct and len(direct) == min(
        k, hashed.select("h").distinct().count()
    )


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
