"""Streaming Holt (O(1) per-key state) must reproduce the batch folds:
bit-identical to the whole-history simple fold (same IEEE op chain) and
6dp-equal to the segmented batch entry."""

from __future__ import annotations

from hpv_etl_code_spark.plans.timeseries_queries import (
    holt_segments,
    holt_simple_fold,
)
from hpv_etl_code_spark.streaming.stateful import holt_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def test_stream_holt_matches_batch(spark, ordered_stream_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    out = holt_stream(stream)
    run_to_memory_sink(out, "holt_stateful", output_mode="update")
    got = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_h3)
        for r in spark.sql(
            "SELECT user_id, n_events, level, trend, forecast_h3 FROM ("
            "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rk"
            "  FROM holt_stateful) WHERE rk = 1"
        ).collect()
    }
    assert got, "stream must emit folds"

    ev = spark.read.parquet(ordered_stream_dir)
    batch = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_h3)
        for r in holt_simple_fold(ev).collect()
    }
    assert got == batch

    # and the segmented batch entry agrees at its 6dp contract
    seg = {
        r.user_id: (r.n_events, r.level, r.trend, r.forecast_h3)
        for r in holt_segments(ev).collect()
    }
    assert got == seg
