"""Streaming burstiness (O(1) per-key integer state) must reproduce the
batch window+aggregate bit-for-bit: same exact-integer sums, same IEEE
chain, same HALF_UP 6dp rounding."""

from __future__ import annotations

from hpv_etl_code_spark.plans.robust_queries import burstiness_over
from hpv_etl_code_spark.streaming.stateful import burstiness_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def test_stream_burstiness_matches_batch(spark, ordered_stream_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    out = burstiness_stream(stream)
    run_to_memory_sink(out, "burstiness_stateful", output_mode="update")
    # update mode emits one row per (user, micro-batch) once n_gaps ≥ 2;
    # the LAST row per user is the final fold — compare against batch
    got = {
        r.user_id: (r.n_gaps, r.mean_gap_s, r.sd_gap_s, r.burstiness)
        for r in spark.sql(
            "SELECT user_id, n_gaps, mean_gap_s, sd_gap_s, burstiness FROM ("
            "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_gaps DESC) rk"
            "  FROM burstiness_stateful) WHERE rk = 1"
        ).collect()
    }
    assert got, "stream must emit burstiness rows"

    ev = spark.read.parquet(ordered_stream_dir)
    batch = {
        r.user_id: (r.n_gaps, r.mean_gap_s, r.sd_gap_s, r.burstiness)
        for r in burstiness_over(ev).collect()
    }
    assert got == batch
