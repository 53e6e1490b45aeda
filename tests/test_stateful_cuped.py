"""Streaming CUPED (per-shard exact integer moments over per-user
pre/post totals) must recover the batch entry's θ / corr / variance
reduction bit-for-bit, and survive a kill-and-restart exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.inference_queries import cuped_variance_reduction
from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.stateful import cuped_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def _reduce_shards(df):
    """Latest row per shard → (n, Sx, Sy, Sxy, Sxx, Syy) exact sums →
    the batch entry's output columns via the ÷n-free identities."""
    latest = (
        df.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("shard").orderBy(
                    (F.col("sxx") + F.col("syy")).desc(),
                    F.col("n_users").desc(),
                )
            ),
        )
        .filter(F.col("__rk") == 1)
    )
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = latest.agg(
        F.sum("n_users").cast("decimal(19,0)").alias("n"),
        F.sum(d("sx")).alias("Sx"),
        F.sum(d("sy")).alias("Sy"),
        F.sum(d("sxy")).alias("Sxy"),
        F.sum(d("sxx")).alias("Sxx"),
        F.sum(d("syy")).alias("Syy"),
    )
    n = F.col("n")
    cov = n * n * F.col("Sxy") - n * F.col("Sx") * F.col("Sy")
    vx = n * n * F.col("Sxx") - n * F.col("Sx") * F.col("Sx")
    vy = n * n * F.col("Syy") - n * F.col("Sy") * F.col("Sy")
    theta = cov.cast("double") / vx.cast("double")
    corr = cov.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
    return sums.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(corr, 6).alias("corr_pre_post"),
        F.round(corr * corr * F.lit(100.0), 6).alias("var_reduction_pct"),
    ).first()


@pytest.fixture()
def _bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).first()


def test_stream_cuped_matches_batch(spark, ordered_stream_dir, sf_dir, _bounds):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    run_to_memory_sink(
        cuped_stream(stream, _bounds.d0, _bounds.d1),
        "cuped_stateful",
        output_mode="update",
    )
    got = _reduce_shards(spark.table("cuped_stateful"))
    batch = cuped_variance_reduction(spark, sf_dir).first()
    assert tuple(got) == tuple(batch)  # bit-identical incl. rounded doubles


def test_stream_cuped_checkpoint_restart_exactly_once(
    spark, sf_dir, tmp_path, _bounds
):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(src)
        q = (
            cuped_stream(stream, _bounds.d0, _bounds.d1)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    run_once()
    got = _reduce_shards(spark.read.parquet(out))
    batch = cuped_variance_reduction(spark, sf_dir).first()
    assert tuple(got) == tuple(batch)
