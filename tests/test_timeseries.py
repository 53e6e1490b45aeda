"""Time-series entries: Holt segmented-fold invariance + gap-fill
interpolation invariants (the oracle gate in test_catalog_oracle.py
carries the bit-level cross-engine checks; these tests lock the
decomposition algebra and the interpolation geometry)."""

from __future__ import annotations

from pyspark.sql import functions as F

import hpv_etl_code_spark.plans.timeseries_queries as tq
from hpv_etl_code_spark.sources.registry import load_table


def test_holt_segmented_equals_simple_fold(spark, sf_dir):
    """The segmented affine-map scan must reproduce the whole-history
    Holt fold at the entry's 6dp output contract — fixture + a
    synthetic 10⁵-event single key (the long-tail-entity shape the
    segmentation exists for). Raw-double bit-equality is not asserted
    (IEEE reassociation); the entry's bit-level determinism is carried
    by the DuckDB twin executing the identical segmented chain."""
    ev = load_table(spark, sf_dir, "events")
    seg = {tuple(r) for r in tq.holt_linear_trend(spark, sf_dir).collect()}
    simple = {tuple(r) for r in tq.holt_simple_fold(ev).collect()}
    assert seg == simple and seg

    n = 100_000
    long_key = spark.range(n).select(
        F.lit(7).cast("long").alias("user_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
        F.col("id").alias("event_id"),
        ((F.col("id") * 37 % 1000) / 10.0).alias("value"),
    )
    a, b = tq._HOLT_ALPHA, tq._HOLT_BETA
    vals = [((i * 37) % 1000) / 10.0 for i in range(n)]
    lvl, trd = vals[1], vals[1] - vals[0]
    for x in vals[2:]:
        lnew = a * x + (1.0 - a) * (lvl + trd)
        trd = b * (lnew - lvl) + (1.0 - b) * trd
        lvl = lnew
    got_simple = {tuple(r) for r in tq.holt_simple_fold(long_key).collect()}
    got_seg = {tuple(r) for r in tq.holt_segments(long_key).collect()}
    assert got_seg == got_simple
    ((uid, n_events, level, trend, fc),) = got_seg
    assert uid == 7 and n_events == n
    import decimal

    def r6(x: float) -> float:
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    assert level == r6(lvl)
    assert trend == r6(trd)


def test_holt_chunk_size_invariance(spark, sf_dir):
    """Widths 1 (every element composes), 7 (uneven boundaries) and
    10⁶ (single chunk) all agree with the whole-history fold at 6dp."""
    ev = load_table(spark, sf_dir, "events")
    expected = {tuple(r) for r in tq.holt_simple_fold(ev).collect()}
    for chunk in (1, 7, 1_000_000):
        got = {tuple(r) for r in tq.holt_segments(ev, chunk=chunk).collect()}
        assert got == expected and got, f"chunk={chunk}"


def test_holt_short_histories(spark):
    """n=1 → level=x₁, trend=0; n=2 → level=x₂, trend=x₂−x₁ (the seed
    itself; no fold steps)."""
    rows = [
        (1, "2024-01-01 00:00:00", 10, 5.0),
        (2, "2024-01-01 00:00:00", 20, 3.0),
        (2, "2024-01-02 00:00:00", 21, 7.5),
    ]
    ev = (
        spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, value double"
        )
        .withColumn("ts", F.to_timestamp("ts"))
    )
    got = {r.user_id: r for r in tq.holt_segments(ev).collect()}
    assert got[1].level == 5.0 and got[1].trend == 0.0
    assert got[2].level == 7.5 and got[2].trend == 4.5
    assert got[2].forecast_h3 == 21.0


def test_gapfill_interpolation_geometry(spark, sf_dir):
    """Observed rows pass through unchanged; gap rows lie strictly
    between their neighbors' values on the straight line (check via
    the closed-form on a hand-built series), and no gap row exists at
    a span endpoint."""
    out = tq.gapfill_linear_interp(spark, sf_dir)
    df = out.toPandas()
    for et, g in df.groupby("event_type"):
        g = g.sort_values("d").reset_index(drop=True)
        assert not g.iloc[0]["is_gap"] and not g.iloc[-1]["is_gap"]
    # hand-built: values 100 at day 0 and 400 at day 3 → gaps 200, 300
    rows = [
        (1, "2024-01-01 12:00:00", 1, "x", 1.00),
        (2, "2024-01-04 12:00:00", 1, "x", 4.00),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    import hpv_etl_code_spark.plans.timeseries_queries as m

    real = m.load_table
    try:
        m.load_table = lambda _s, _d, _t: ev
        got = sorted(
            (str(r.d), r.is_gap, r.cents)
            for r in tq.gapfill_linear_interp(spark, "unused").collect()
        )
    finally:
        m.load_table = real
    assert got == [
        ("2024-01-01", False, 100.0),
        ("2024-01-02", True, 200.0),
        ("2024-01-03", True, 300.0),
        ("2024-01-04", False, 400.0),
    ]
