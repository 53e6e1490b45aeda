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


def test_hilbert_is_bijective_with_unit_steps(spark):
    """Full order-5 grid (32x32): the Spark expression chain must be a
    bijection onto [0, 1024) whose consecutive positions are grid
    neighbors — the defining Hilbert properties (a wrong reflection
    width or swapped rotation breaks one of them)."""
    from hpv_etl_code_spark.operators.layout import hilbert_xy2d

    grid = spark.range(1024).select(
        (F.col("id") / 32).cast("long").alias("x"),
        (F.col("id") % 32).alias("y"),
    )
    rows = hilbert_xy2d(grid, "x", "y", "d", order=5).collect()
    pts = {r.d: (r.x, r.y) for r in rows}
    assert len(pts) == 1024
    assert set(pts) == set(range(1024))
    for d in range(1023):
        x1, y1 = pts[d]
        x2, y2 = pts[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_prunes_no_worse_than_zorder(spark, sf_dir):
    """The point of the entry: on the shared rectangle + file-size
    simulation, Hilbert's read amplification must not exceed
    Z-order's."""
    rows = {
        r.layout: r
        for r in ops_queries.hilbert_prune_stats(spark, sf_dir).collect()
    }
    assert set(rows) == {"zorder", "hilbert"}
    z, h = rows["zorder"], rows["hilbert"]
    assert z.n_rows == h.n_rows
    assert h.n_files_read <= z.n_files_read
    if z.read_amplification and h.read_amplification:
        assert h.read_amplification <= z.read_amplification


def test_hilbert_order16_extremes_match_reference(spark):
    """Order-16 corners/diagonals vs a pure-Python xy2d reference —
    catches 32-bit overflow in the level weights (s*s*3 > INT_MAX once
    the top bit of a dimension is set; regression from the sf1 sweep)."""
    from hpv_etl_code_spark.operators.layout import hilbert_xy2d

    def ref(order, x, y):
        d, s = 0, 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    pts = [(0, 0), (65535, 0), (0, 65535), (65535, 65535),
           (32768, 32767), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.d
        for r in hilbert_xy2d(df, "x", "y", "d", order=16).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == ref(16, x, y), (x, y)
