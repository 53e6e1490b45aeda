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


def test_stream_zscore_matches_batch_with_nulls(spark, tmp_path):
    """ADVICE r4: NULL value events (pandas delivers NaN into the
    scorer) must not crash the stream, and stream ≡ batch must hold on
    dirty data: the null event emits a null-z row when its trailing
    frame qualifies, and is skipped from later frames."""
    import os
    import time

    from pyspark.sql import functions as F

    rows = []
    for u in (1, 2):
        for i in range(20):
            val = None if i % 7 == 3 else float(10 + (i * 13 + u * 5) % 9)
            rows.append((u * 1000 + i, u, f"2024-01-{i + 1:02d} 00:00:00",
                         "click" if i % 2 else "view", val))
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    root = tmp_path / "nulldrops"
    data = root / "data"
    data.mkdir(parents=True)
    for ci, (lo, hi) in enumerate([(0, 7), (7, 14), (14, 20)]):
        chunk = df.filter(
            (F.dayofmonth("ts") > lo) & (F.dayofmonth("ts") <= hi)
        )
        cdir = str(root / f"chunk{ci}")
        chunk.coalesce(1).write.parquet(cdir)
        for f in os.listdir(cdir):
            if f.endswith(".parquet"):
                src = os.path.join(cdir, f)
                dst = str(data / f"c{ci}.parquet")
                os.rename(src, dst)
                os.utime(dst, (time.time() + ci, time.time() + ci))

    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(data))
    )
    out = zscore_stream(stream)
    run_to_memory_sink(out, "zscores_nulls", output_mode="append")
    got = {
        r.event_id: (r.event_type, r.z)
        for r in spark.sql("SELECT * FROM zscores_nulls").collect()
    }
    batch = {
        r.event_id: (r.event_type, r.z) for r in rolling_zscores(df).collect()
    }
    assert got == batch and got
    assert any(z is None for _, z in got.values()), (
        "fixture must exercise the null-z emission path"
    )
