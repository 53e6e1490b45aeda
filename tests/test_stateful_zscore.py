"""Streaming rolling z-score (applyInPandasWithState, bounded ring-buffer
state) must reproduce the batch rolling_zscores rows EXACTLY — same ids,
same 6dp z values — across multiple micro-batches."""

from __future__ import annotations

from hpv_etl_code_spark.plans.mining_queries import rolling_zscores
from hpv_etl_code_spark.streaming.stateful import zscore_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def test_stream_zscore_matches_batch(spark, ordered_stream_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    out = zscore_stream(stream)
    run_to_memory_sink(out, "zscores_stateful", output_mode="append")
    got = {
        r.event_id: (r.event_type, r.z)
        for r in spark.sql("SELECT * FROM zscores_stateful").collect()
    }
    assert got, "stream must emit scores"

    batch = {
        r.event_id: (r.event_type, r.z)
        for r in rolling_zscores(spark.read.parquet(ordered_stream_dir)).collect()
    }
    assert got == batch
