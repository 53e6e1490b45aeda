"""Streaming EWMA (O(1) per-key state) must reproduce the batch folds:
bit-identical to the simple whole-history fold (same IEEE op chain) and
6dp-equal to the segmented batch entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.mining_queries import ewma_simple_fold
from hpv_etl_code_spark.streaming.stateful import ewma_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def test_stream_ewma_matches_batch(spark, ordered_stream_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    out = ewma_stream(stream)
    run_to_memory_sink(out, "ewma_stateful", output_mode="update")
    # update mode emits one row per (user, micro-batch); the LAST row
    # per user is the final fold — compare against batch
    got = {
        r.user_id: (r.n_events, r.ewma_value, r.last_value)
        for r in spark.sql(
            "SELECT user_id, n_events, ewma_value, last_value FROM ("
            "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rk"
            "  FROM ewma_stateful) WHERE rk = 1"
        ).collect()
    }
    assert got, "stream must emit folds"

    ev = spark.read.parquet(ordered_stream_dir)
    batch = {
        r.user_id: (r.n_events, r.ewma_value, r.last_value)
        for r in ewma_simple_fold(ev).collect()
    }
    assert got == batch
