"""Streaming daily OHLC (O(1) integer state per day) must reproduce the
batch grouped-rank aggregate bit-for-bit: same exact-cents casts, same
first/last selection under the (ts, event_id) order."""

from __future__ import annotations

import datetime as dt

from hpv_etl_code_spark.plans.timeseries_queries import ohlc_over
from hpv_etl_code_spark.streaming.stateful import ohlc_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def test_stream_ohlc_matches_batch(spark, ordered_stream_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    out = ohlc_stream(stream)
    run_to_memory_sink(out, "ohlc_stateful", output_mode="update")
    got = {
        r.day: (r.n_events, r.open_cents, r.high_cents, r.low_cents, r.close_cents)
        for r in spark.sql(
            "SELECT day, n_events, open_cents, high_cents, low_cents, close_cents"
            " FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY n_events DESC) rk"
            "       FROM ohlc_stateful) WHERE rk = 1"
        ).collect()
    }
    assert got, "stream must emit OHLC bars"

    ev = spark.read.parquet(ordered_stream_dir)
    batch = {
        r.day: (r.n_events, r.open_cents, r.high_cents, r.low_cents, r.close_cents)
        for r in ohlc_over(ev).collect()
    }
    assert set(got) == set(batch)
    assert got == batch
    assert all(isinstance(d, dt.date) for d in got)


def test_stream_ohlc_tolerates_null_values(spark, tmp_path):
    """ADVICE r5: a NULL value event must not crash the fold, and the
    stream must still mirror the batch twin's Spark semantics — null at
    the open/close boundary row propagates (min_by/max_by), COUNT(*)
    counts null rows, max/min skip them."""
    rows = [
        # day 1: null open, null close, nulls interleaved
        (1, "2024-03-01 09:00:00", "t", None),
        (2, "2024-03-01 10:00:00", "t", 5.25),
        (3, "2024-03-01 11:00:00", "t", 1.75),
        (4, "2024-03-01 12:00:00", "t", None),
        # day 2: all null
        (5, "2024-03-02 09:00:00", "t", None),
        # day 3: normal
        (6, "2024-03-03 09:00:00", "t", 3.00),
        (7, "2024-03-03 10:00:00", "t", 9.50),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value"
    )
    src = str(tmp_path / "null_events")
    ev.coalesce(1).sortWithinPartitions("ts").write.parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    run_to_memory_sink(
        ohlc_stream(stream), "ohlc_nulls", output_mode="update"
    )
    got = {
        r.day: (r.n_events, r.open_cents, r.high_cents, r.low_cents, r.close_cents)
        for r in spark.sql(
            "SELECT day, n_events, open_cents, high_cents, low_cents, close_cents"
            " FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY n_events DESC) rk"
            "       FROM ohlc_nulls) WHERE rk = 1"
        ).collect()
    }
    batch = {
        r.day: (r.n_events, r.open_cents, r.high_cents, r.low_cents, r.close_cents)
        for r in ohlc_over(spark.read.parquet(src)).collect()
    }
    assert got == batch
    d1 = dt.date(2024, 3, 1)
    assert got[d1] == (4, None, 525, 175, None)
    assert got[dt.date(2024, 3, 2)] == (1, None, None, None, None)
    assert got[dt.date(2024, 3, 3)] == (2, 300, 950, 300, 950)
