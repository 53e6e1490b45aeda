"""Retraction-aware incremental matview: stream ≡ batch net view
(exact — integer cents), exactly-once across a checkpoint restart,
full-retraction keys disappear, and LSM compaction is read-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.matview import (
    cdc_matview_stream,
    cdc_net_batch,
    compact_matview,
    read_matview,
)


def _cdc_frame(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        "user_id",
        F.when(F.col("event_id") % 7 == 3, F.lit("D"))
        .otherwise(F.lit("I"))
        .alias("op"),
        "value",
    )


def _run(spark, src, schema, store, ckpt):
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    q = cdc_matview_stream(stream, store, ckpt)
    q.awaitTermination()


def test_stream_matview_equals_batch_with_restart(spark, sf_dir, tmp_path):
    cdc = _cdc_frame(spark, sf_dir)
    batch = {tuple(r) for r in cdc_net_batch(cdc).collect()}

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    cdc.filter(F.col("event_id") % 3 == 0).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    _run(spark, src, schema, store, ckpt)

    # restart with no new data — no double-apply
    mid = {tuple(r) for r in read_matview(spark, store).collect()}
    _run(spark, src, schema, store, ckpt)
    assert {tuple(r) for r in read_matview(spark, store).collect()} == mid

    cdc.filter(F.col("event_id") % 3 != 0).write.mode("append").parquet(src)
    _run(spark, src, schema, store, ckpt)

    got = {tuple(r) for r in read_matview(spark, store).collect()}
    assert got == batch and got
    assert spark.read.parquet(f"{store}/parts").count() > len(got), (
        "multiple parts must exist pre-compaction"
    )

    compact_matview(spark, store)
    assert {tuple(r) for r in read_matview(spark, store).collect()} == batch

    # streaming continues against the compacted store: full retraction —
    # delete EVERY surviving row of one user; the key must disappear
    victim = sorted(r[0] for r in got)[0]
    net_n = dict((r[0], r[1]) for r in got)[victim]
    assert net_n > 0
    retract = (
        cdc.filter((F.col("user_id") == victim) & (F.col("op") == "I"))
        .withColumn("op", F.lit("D"))
        .unionByName(
            cdc.filter((F.col("user_id") == victim) & (F.col("op") == "D"))
            .withColumn("op", F.lit("I"))
        )
    )
    retract.write.mode("append").parquet(src)
    _run(spark, src, schema, store, ckpt)
    after = {r[0] for r in read_matview(spark, store).collect()}
    assert victim not in after
    assert after == {u for u, *_ in batch} - {victim}
