"""Streaming CUSUM (O(1) integer state) must equal the segmented batch
fold EXACTLY — same final/max statistics and alarm bits — because the
integer (max,+) algebra has no reassociation seam. Also restart-safe:
state round-trips through the checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.inference_queries import (
    _CUSUM_H_MULT,
    cusum_segments,
)
from hpv_etl_code_spark.streaming.stateful import cusum_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def _batch_k(spark, ordered_stream_dir) -> int:
    ev = spark.read.parquet(ordered_stream_dir)
    row = ev.select(
        F.expr(
            "CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))"
            " DIV count(*) AS BIGINT)"
        ).alias("k")
    ).collect()[0]
    return int(row.k)


def test_stream_cusum_equals_batch_exactly(spark, ordered_stream_dir):
    k = _batch_k(spark, ordered_stream_dir)
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    out = cusum_stream(stream, k=k, h_mult=_CUSUM_H_MULT)
    run_to_memory_sink(out, "cusum_stateful", output_mode="update")
    got = {
        r.user_id: (r.n_events, r.final_cusum, r.max_cusum, r.alarmed)
        for r in spark.sql(
            "SELECT user_id, n_events, final_cusum, max_cusum, alarmed"
            " FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id"
            " ORDER BY n_events DESC) rk FROM cusum_stateful) WHERE rk = 1"
        ).collect()
    }
    assert got

    ev = spark.read.parquet(ordered_stream_dir).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    batch = {
        r.user_id: (r.n_events, r.final_cusum, r.max_cusum, r.alarmed)
        for r in cusum_segments(ev).collect()
    }
    assert got == batch
