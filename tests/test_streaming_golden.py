"""Streaming golden records (incremental ER over a persisted member
store + merge log) must reproduce the batch golden_record_parts output
exactly — including cross-batch BRIDGE merges — and stay exactly-once
across a checkpoint restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.mining_queries import golden_record_parts
from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.golden import (
    read_golden_records,
    stream_golden_records,
)


def _run_stream(spark, src, schema, store, ckpt):
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    q = stream_golden_records(stream, store, ckpt)
    q.awaitTermination()


def test_stream_golden_equals_batch_and_restarts(spark, sf_dir, tmp_path):
    p = load_table(spark, sf_dir, "part")
    batch = {tuple(r) for r in golden_record_parts(spark, sf_dir).collect()}

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    # 3 key-interleaved chunks: fuzzy clusters span chunks, so the
    # bridge path (merge log) is genuinely exercised
    p.filter(F.col("p_partkey") % 3 == 0).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    _run_stream(spark, src, schema, store, ckpt)
    p.filter(F.col("p_partkey") % 3 == 1).write.mode("append").parquet(src)
    _run_stream(spark, src, schema, store, ckpt)

    # restart with no new data: checkpoint must prevent re-append
    mid = {tuple(r) for r in read_golden_records(spark, store).collect()}
    _run_stream(spark, src, schema, store, ckpt)
    assert {tuple(r) for r in read_golden_records(spark, store).collect()} == mid

    p.filter(F.col("p_partkey") % 3 == 2).write.mode("append").parquet(src)
    _run_stream(spark, src, schema, store, ckpt)

    got = {tuple(r) for r in read_golden_records(spark, store).collect()}
    assert got == batch and got

    # the merge log must have recorded at least one cross-batch bridge
    # (otherwise this fixture isn't testing the mechanism)
    merges = spark.read.parquet(f"{store}/merges")
    assert merges.count() > 0
    assert merges.filter(F.col("new_cluster") >= F.col("old_cluster")).count() == 0


def test_compaction_preserves_golden_records(spark, sf_dir, tmp_path):
    """Folding the merge log into the member table (LSM compaction) must
    not change read_golden_records, and further streaming after a
    compaction must still agree with batch ER on the union."""
    from hpv_etl_code_spark.streaming.golden import compact_golden_store

    p = load_table(spark, sf_dir, "part")
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    p.filter(F.col("p_partkey") % 3 == 0).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    _run_stream(spark, src, schema, store, ckpt)
    p.filter(F.col("p_partkey") % 3 == 1).write.mode("append").parquet(src)
    _run_stream(spark, src, schema, store, ckpt)

    before = {tuple(r) for r in read_golden_records(spark, store).collect()}
    assert spark.read.parquet(f"{store}/merges").count() > 0
    compact_golden_store(spark, store)
    assert spark.read.parquet(f"{store}/merges").count() == 0
    after = {tuple(r) for r in read_golden_records(spark, store).collect()}
    assert after == before

    # streaming continues against the compacted store
    p.filter(F.col("p_partkey") % 3 == 2).write.mode("append").parquet(src)
    _run_stream(spark, src, schema, store, ckpt)
    got = {tuple(r) for r in read_golden_records(spark, store).collect()}
    batch = {tuple(r) for r in golden_record_parts(spark, sf_dir).collect()}
    assert got == batch
