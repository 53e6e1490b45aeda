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
