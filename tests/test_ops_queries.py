"""Invariant tests for plans/ops_queries.py beyond the oracle mirror:
compaction-plan conservation/contiguity and skew-report sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans import ops_queries
from hpv_etl_code_spark.sources.registry import load_table


def test_compaction_plan_conserves_inventory(spark, sf_dir):
    plan = ops_queries.compaction_plan_events(spark, sf_dir).collect()
    assert plan
    ev = load_table(spark, sf_dir, "events")
    inv = ev.groupBy(F.to_date("ts"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.lit(28) + F.length("props") + F.length("event_type")
        ).alias("b"),
    )
    tot = inv.agg(
        F.count(F.lit(1)), F.sum("n"), F.sum("b")
    ).collect()[0]
    assert sum(r.n_files for r in plan) == tot[0]
    assert sum(r.n_rows for r in plan) == tot[1]
    assert sum(r.total_bytes for r in plan) == tot[2]
    # buckets are contiguous from 0 (first-fit over cumulative space)
    buckets = sorted(r.bucket for r in plan)
    assert buckets == list(range(len(buckets)))
    # fill_ratio is exactly bytes/target at 6dp
    for r in plan:
        assert (
            abs(
                r.fill_ratio
                - r.total_bytes / float(ops_queries._COMPACT_TARGET)
            )
            < 5e-7
        ), r


def test_join_skew_report_sanity(spark, sf_dir):
    rows = {r.join_col: r for r in ops_queries.join_skew_report(
        spark, sf_dir
    ).collect()}
    assert set(rows) == {
        "lineitem.l_orderkey",
        "lineitem.l_partkey",
        "lineitem.l_suppkey",
        "events.user_id",
    }
    li_n = load_table(spark, sf_dir, "lineitem").count()
    ev_n = load_table(spark, sf_dir, "events").count()
    for name, r in rows.items():
        expected_n = ev_n if name.startswith("events") else li_n
        assert r.n_rows == expected_n, name
        assert 1 <= r.suggested_salts, name
        assert 0.0 < r.heavy_share <= 1.0, name
        assert r.max_key_rows * r.n_keys >= r.n_rows, name
