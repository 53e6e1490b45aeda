"""Plan + semantics tests for the skyline / bitmap-distinct / TWAP
entries (plans/olap_queries.py). Oracle equivalence at sf0.001 is
covered by test_catalog_oracle.py's parameterization; these tests lock
the SCALE properties and the tie semantics the oracle can't see."""

from __future__ import annotations

import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.plans.lint import assert_scalable
from hpv_etl_code_spark.plans.olap_queries import skyline_parts
from hpv_etl_code_spark.plans import olap_queries


def _df(spark, sf_dir, name):
    return catalog.entries()[name].fn(spark, sf_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_olap_entries_pass_scale_lint(spark, sf_dir):
    for name in (
        "skyline_parts",
        "bitmap_distinct_events",
        "twap_events",
        "ab_welch_ttest",
        "psi_value_drift",
    ):
        assert_scalable(_df(spark, sf_dir, name))


def test_skyline_joins_all_broadcast(spark, sf_dir):
    """Bounds, cross-bucket prefix and the frontier join-back are all
    metadata-sized broadcasts — the base table is never shuffled for a
    join (its only exchange is the per-price shrink aggregation)."""
    plan = _plan(_df(spark, sf_dir, "skyline_parts"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_skyline_ties_and_dominance(spark):
    """Same-price-same-size ties ALL survive (neither strictly beats
    the other); strictly-dominated rows drop; cross-bucket dominance
    (max price in the top bucket kills everything below with size >=
    its own) is honored."""
    rows = [
        Row(p_partkey=1, p_retailprice=100.0, p_size=5),
        Row(p_partkey=2, p_retailprice=100.0, p_size=5),   # tie of 1 — survives
        Row(p_partkey=3, p_retailprice=100.0, p_size=7),   # same price, worse size
        Row(p_partkey=4, p_retailprice=90.0, p_size=5),    # dominated by 1 (price)
        Row(p_partkey=5, p_retailprice=90.0, p_size=3),    # frontier (better size)
        Row(p_partkey=6, p_retailprice=10.0, p_size=1),    # frontier (best size)
        Row(p_partkey=7, p_retailprice=10.0, p_size=4),    # dominated by 5
    ]
    spark.createDataFrame(rows).createOrReplaceTempView("__sky_parts")

    # run the same logic against the in-memory table by monkey-free
    # indirection: write it as parquet and point the entry at it
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.table("__sky_parts").write.parquet(os.path.join(d, "part.parquet"))
        got = {
            r.p_partkey
            for r in skyline_parts(spark, d).collect()
        }
    assert got == {1, 2, 5, 6}


def test_bitmap_equals_exact_everywhere(spark, sf_dir):
    out = _df(spark, sf_dir, "bitmap_distinct_events").collect()
    assert out, "expected at least one event_type"
    for r in out:
        assert r.bitmap_distinct == r.exact_distinct, r
        assert r.n_words >= 1


def test_twap_single_exchange_chain(spark, sf_dir):
    """lead-window + weighted sums + groupBy all cluster by user_id:
    exactly ONE exchange in the whole plan."""
    plan = _plan(_df(spark, sf_dir, "twap_events"))
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan


def test_twap_semantics_holding_time(spark):
    """Three events at t=0,10,40 with values 1,4,7: TWAP weights value
    1 by 10 s and value 4 by 30 s; the final observation has no holding
    time. Single-event users yield NULL."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=1, ts=base, user_id=1, event_type="x", value=1.0, props="{}"),
        Row(
            event_id=2,
            ts=base + dt.timedelta(seconds=10),
            user_id=1,
            event_type="x",
            value=4.0,
            props="{}",
        ),
        Row(
            event_id=3,
            ts=base + dt.timedelta(seconds=40),
            user_id=1,
            event_type="x",
            value=7.0,
            props="{}",
        ),
        Row(event_id=4, ts=base, user_id=2, event_type="x", value=9.0, props="{}"),
    ]
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "events.parquet"))
        got = {r.user_id: r for r in olap_queries.twap_events(spark, d).collect()}
    assert got[1].held_secs == 40
    assert abs(got[1].twap_value - (1.0 * 10 + 4.0 * 30) / 40) < 1e-9
    assert got[2].held_secs is None and got[2].twap_value is None


def test_welch_ttest_against_scipy_formula(spark, sf_dir):
    """Cross-check the SQL-shaped Welch computation against a direct
    NumPy implementation on the same deterministic arm split."""
    import numpy as np
    import pandas as pd

    from hpv_etl_code_spark.plans.olap_queries import ab_welch_ttest
    from hpv_etl_code_spark.sources.registry import load_table

    got = {r.event_type: r for r in ab_welch_ttest(spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    ).toPandas()
    import hashlib

    def arm(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    pdf["arm"] = pdf["user_id"].map(arm)
    for et, g in pdf.groupby("event_type"):
        a = g[g.arm == 0]["value"].to_numpy()
        b = g[g.arm == 1]["value"].to_numpy()
        v0, v1 = a.var(ddof=1), b.var(ddof=1)
        se2 = v0 / len(a) + v1 / len(b)
        t = (b.mean() - a.mean()) / np.sqrt(se2)
        dof = se2**2 / (
            (v0 / len(a)) ** 2 / (len(a) - 1) + (v1 / len(b)) ** 2 / (len(b) - 1)
        )
        r = got[et]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert abs(r.t_stat - t) < 1e-4, (et, r.t_stat, t)
        assert abs(r.welch_df - dof) < max(1e-3, abs(dof) * 1e-5), (et, r.welch_df, dof)


def test_welch_single_fact_exchange(spark, sf_dir):
    """Sufficient statistics in one (event_type, arm) grouped pass;
    the pivot regroups metadata-sized rows — the plan never shuffles
    the fact twice and passes the scale lint."""
    from hpv_etl_code_spark.plans.lint import assert_scalable
    from hpv_etl_code_spark.plans.olap_queries import ab_welch_ttest

    df = ab_welch_ttest(spark, sf_dir)
    assert_scalable(df)


def test_psi_zero_drift_on_identical_periods(spark, tmp_path):
    """If both halves of the time range see the same value
    distribution, every PSI term is 0 and the total is 0."""
    import datetime as dt

    from hpv_etl_code_spark.plans.olap_queries import psi_value_drift

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # same multiset of values in hour 0 and in hour 10
    for half, off in ((0, 0), (1, 36000)):
        for i, v in enumerate((1.0, 2.5, 2.5, 7.75, 9.0)):
            rows.append(
                (eid, base + dt.timedelta(seconds=off + i), 1, "x", v, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = psi_value_drift(spark, str(tmp_path)).collect()
    for r in out:
        assert r.psi_term == 0.0, r
    total = [r for r in out if r.bucket == -1][0]
    assert total.n_a == 5 and total.n_b == 5


def test_incremental_matview_never_rescans_kept_base_rows(spark, sf_dir):
    """The delta branch must read only changed keys (pushed filters on
    the changelog scans) and the maintained view must equal the
    recompute-from-final-table baseline exactly."""
    from hpv_etl_code_spark.functions.numeric import dsum
    from hpv_etl_code_spark.plans.analytics_queries import (
        incremental_matview_orders,
    )
    from hpv_etl_code_spark.plans.lint import assert_scalable
    from hpv_etl_code_spark.sources.registry import load_table

    df = incremental_matview_orders(spark, sf_dir)
    assert_scalable(df)

    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    final_t = (
        o.filter(key % 7 == 0)
        .select("o_custkey", (F.col("o_totalprice") * 2).alias("p"))
        .unionByName(
            o.filter(key % 1000 == 3).select(
                "o_custkey", F.col("o_totalprice").alias("p")
            )
        )
        .unionByName(
            o.filter((key % 7 != 0) & (key % 11 != 5)).select(
                "o_custkey", F.col("o_totalprice").alias("p")
            )
        )
    )
    recomputed = final_t.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("p").alias("total_spend")
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, recomputed.collect()))
    assert got == want


def test_journey_sampling_sketch_entries_scale_lint(spark, sf_dir):
    """The continuation-3b entries pass the scale lint; journey paths
    keep the WindowGroupLimit pruning and the set-algebra bottom-k
    compiles to TakeOrderedAndProject, not a global sort."""
    from hpv_etl_code_spark.plans.lint import assert_scalable

    for name in (
        "user_journey_paths",
        "sampled_quantile_portable",
        "kmv_set_algebra_portable",
        "incremental_matview_orders",
    ):
        assert_scalable(_df(spark, sf_dir, name))

    journey = _plan(_df(spark, sf_dir, "user_journey_paths"))
    assert "WindowGroupLimit" in journey
    algebra = _plan(_df(spark, sf_dir, "kmv_set_algebra_portable"))
    assert "TakeOrderedAndProject" in algebra


def test_kmv_set_algebra_invariants(spark, sf_dir):
    """Sketch-algebra sanity on real data: union estimate is at least
    each side's estimate under exact-mode (n<k groups are exact), and
    exact inclusion-exclusion holds by construction."""
    r = _df(spark, sf_dir, "kmv_set_algebra_portable").collect()[0]
    assert r.exact_intersection == r.exact_a + r.exact_b - r.exact_union
    assert r.exact_union >= max(r.exact_a, r.exact_b)
    # estimator is exact when a set has fewer than k=64 distinct members
    if r.exact_a < 64:
        assert r.est_a == r.exact_a
    if r.exact_union < 64:
        assert r.est_union == r.exact_union


def test_join_size_cms_upper_bounds_and_is_tight(spark, sf_dir):
    """CMS inner product can only over-count (hash collisions add), so
    est >= exact; the expected overshoot is the ADDITIVE term
    |A|·|B|/width (independent of the true join size — dominant when
    the join is sparse), so assert est <= exact + 3·|A|·|B|/width."""
    from hpv_etl_code_spark.plans.temporal_graph_queries import (
        JOINSIZE_CMS_WIDTH,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    r = _df(spark, sf_dir, "join_size_estimate_cms").collect()[0]
    assert r.est_join_size >= r.exact_join_size
    n_a = load_table(spark, sf_dir, "orders").count()
    n_b = load_table(spark, sf_dir, "lineitem").count()
    assert (
        r.est_join_size
        <= r.exact_join_size + 3 * n_a * n_b // JOINSIZE_CMS_WIDTH
    ), r


def test_ansi_degenerate_groups_yield_null_not_crash(spark, tmp_path):
    """Spark 4 runs ANSI mode (a bare /0 raises): the reproduced
    divide-by-zero crashes — same-second TWAP users, single-row Welch
    arms, single-row scaling groups — must instead yield NULL."""
    import datetime as dt

    from hpv_etl_code_spark.plans.olap_queries import ab_welch_ttest, twap_events
    from hpv_etl_code_spark.plans.quality_queries import feature_scaling_battery

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two events in the SAME second -> sum(dt)=0
        (1, base, 1, "same_sec", 5.0, "{}"),
        (2, base + dt.timedelta(microseconds=500), 1, "same_sec", 7.0, "{}"),
        # 'solo' event type: exactly one row -> n-1 = 0 in variance
        (3, base, 2, "solo", 3.0, "{}"),
        # welch: user ids chosen so one md5 arm of 'skewed' has 1 row
        (4, base, 1, "skewed", 1.0, "{}"),
        (5, base, 2, "skewed", 2.0, "{}"),
        (6, base, 4, "skewed", 3.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    d = str(tmp_path)

    twap = {r.user_id: r for r in twap_events(spark, d).collect()}
    assert twap[1].held_secs == 0 and twap[1].twap_value is None

    welch = {r.event_type: r for r in ab_welch_ttest(spark, d).collect()}
    for r in welch.values():
        # no crash; degenerate arms surface as NULL statistics
        assert r.n_a is None or r.n_a >= 1

    scaled = feature_scaling_battery(spark, d).collect()
    solo = [r for r in scaled if r.event_type == "solo"][0]
    assert solo.zscore is None and solo.minmax is None
