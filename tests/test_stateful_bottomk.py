"""Streaming bottom-k quantile sample: mergeable, arrival-order-free —
the final per-type sample (and its median) must equal the batch window
exactly, whatever the micro-batch cuts, and survive restart."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.stateful import bottomk_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


def _batch_sample(ev, k=32):
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    sample = (
        ev.select("event_type", "value", "event_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    return {
        r.event_type: (r.n_sample, r.sample_median)
        for r in sample.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sample"),
            F.round(F.median("value"), 6).alias("sample_median"),
        )
        .collect()
    }


def _latest(df):
    return {
        r.event_type: (r.n_sample, r.sample_median)
        for r in df.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.col("n_seen").desc())
            ),
        )
        .filter(F.col("__rk") == 1)
        .collect()
    }


def test_stream_bottomk_matches_batch(spark, ordered_stream_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    run_to_memory_sink(bottomk_stream(stream), "bottomk_stateful", "update")
    got = _latest(spark.table("bottomk_stateful"))
    batch = _batch_sample(spark.read.parquet(ordered_stream_dir))
    assert got == batch and got


def test_stream_bottomk_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(src)
        q = (
            bottomk_stream(stream)
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
    got = _latest(spark.read.parquet(out))
    assert got == _batch_sample(ev)  # a replayed batch would inflate n_seen
