"""Real Structured Streaming tests: the same window functions that pass
the batch oracle are run as incremental streams (file source →
availableNow → memory sink) and must produce identical results; plus the
streaming-only operators (watermark dedup, applyInPandasWithState)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.stream import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory_sink,
    running_user_counts,
)
from hpv_etl_code_spark.streaming.windows import tumbling_counts


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Stage the events parquet as a stream-source directory, re-written
    through the registry so the ns→µs ts conversion is baked in."""
    d = tmp_path_factory.mktemp("events_stream")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(str(d / "data"))
    return str(d / "data")


def _stream(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    return read_events_stream(spark, events_stream_dir, schema)


def test_streaming_tumbling_equals_batch(spark, events_stream_dir):
    stream = _stream(spark, events_stream_dir)
    windowed = tumbling_counts(stream, duration="1 hour", watermark="2 hours")
    run_to_memory_sink(windowed, "tumbling_test", output_mode="complete")
    got = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = tumbling_counts(spark.read.parquet(events_stream_dir), duration="1 hour")
    want = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in batch.collect()
    }
    assert got == want


def test_streaming_sliding_equals_batch(spark, events_stream_dir):
    from hpv_etl_code_spark.streaming.windows import sliding_counts

    stream = _stream(spark, events_stream_dir)
    windowed = sliding_counts(
        stream, duration="1 day", slide="12 hours", watermark="1 day"
    )
    run_to_memory_sink(windowed, "sliding_test", output_mode="complete")
    got = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM sliding_test").collect()
    }
    want = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in sliding_counts(
            spark.read.parquet(events_stream_dir), duration="1 day", slide="12 hours"
        ).collect()
    }
    assert got == want


def test_streaming_session_windows_equals_batch(spark, events_stream_dir):
    from hpv_etl_code_spark.streaming.windows import session_windows

    stream = _stream(spark, events_stream_dir)
    sessions = session_windows(stream, gap="4 hours", watermark="2 days")
    run_to_memory_sink(sessions, "session_test", output_mode="complete")
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM session_test").collect()
    }
    want = {
        (r.user_id, str(r.session_start)): (r.n_events, r.sum_value)
        for r in session_windows(
            spark.read.parquet(events_stream_dir), gap="4 hours"
        ).collect()
    }
    assert got == want


def test_streaming_dedup_within_watermark(spark, events_stream_dir):
    stream = _stream(spark, events_stream_dir)
    deduped = dedup_within_watermark(stream, ["user_id", "event_type"], watermark="30 days")
    run_to_memory_sink(deduped, "dedup_test", output_mode="append")
    got = spark.sql("SELECT count(*) AS n FROM dedup_test").collect()[0].n
    want = (
        spark.read.parquet(events_stream_dir)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got == want


def test_stream_static_enrichment(spark, sf_dir, events_stream_dir):
    """Stream⋈static: enrich the event stream with the customer
    dimension (broadcast on the stream side — no stateful join needed)."""
    from hpv_etl_code_spark.sources.registry import load_table

    stream = _stream(spark, events_stream_dir)
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        stream.join(F.broadcast(customers), "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    run_to_memory_sink(enriched, "enrich_test", output_mode="complete")
    got = {
        r.c_mktsegment: r.n for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    want = {
        r.c_mktsegment: r.n
        for r in spark.read.parquet(events_stream_dir)
        .join(customers, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_stream_stream_join_with_watermarks(spark, events_stream_dir):
    """Stream⋈stream: purchases joined to the same user's signups within
    a bounded interval — both sides watermarked so join state is evicted
    (the unbounded-state trap this API exists to avoid)."""
    stream = _stream(spark, events_stream_dir)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 days")
    )
    signups = (
        stream.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "2 days")
    )
    joined = purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select("p_id", "user_id", "p_ts", "s_ts")
    run_to_memory_sink(joined, "ss_join_test", output_mode="append")
    got = {
        (r.p_id, str(r.s_ts)) for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }
    ev = spark.read.parquet(events_stream_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    want = {
        (r.p_id, str(r.s_ts))
        for r in p.join(
            s,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("s_ts") <= F.col("p_ts"))
            & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        ).collect()
    }
    assert got == want and got


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart fault tolerance: a checkpointed file-source →
    parquet-sink stream processes the initial files, stops, new files
    arrive, the SAME checkpoint resumes — output must contain every row
    exactly once (no reprocessing of the first batch)."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_dir, "events")
    first_half = ev.filter(F.col("event_id") % 2 == 0)
    second_half = ev.filter(F.col("event_id") % 2 == 1)
    first_half.write.mode("overwrite").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = (
            spark.readStream.format("parquet").schema(schema).load(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first_half.count()

    second_half.write.mode("append").parquet(str(src))
    run_once()  # resume from the same checkpoint

    got_ids = [r.event_id for r in spark.read.parquet(out).select("event_id").collect()]
    assert len(got_ids) == ev.count(), "restart must process ONLY the new files"
    assert len(set(got_ids)) == len(got_ids), "no row may be duplicated"


def test_apply_in_pandas_with_state(spark, events_stream_dir):
    stream = _stream(spark, events_stream_dir)
    counts = running_user_counts(stream)
    run_to_memory_sink(counts, "state_test", output_mode="update")
    # final update per user must equal the batch per-user count
    got = {
        r.user_id: r.n_events
        for r in spark.sql(
            """SELECT user_id, max(n_events) AS n_events
               FROM state_test GROUP BY user_id"""
        ).collect()
    }
    want = {
        r.user_id: r.n
        for r in spark.read.parquet(events_stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_upsert_to_parquet_cdc(spark, sf_dir, tmp_path):
    """foreachBatch CDC upsert: stream micro-batches merge into a
    parquet target — after two batches the target equals
    'latest batch wins per key'."""
    from hpv_etl_code_spark.streaming.stream import stream_upsert_to_parquet

    src = tmp_path / "cdc_src"
    target = str(tmp_path / "cdc_target")
    ckpt = str(tmp_path / "cdc_ckpt")

    batch1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, s STRING, v DOUBLE"
    )
    batch1.write.mode("overwrite").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    def run_once():
        stream = spark.readStream.format("parquet").schema(schema).load(str(src))
        q = stream_upsert_to_parquet(stream, target, ["k"], ckpt)
        q.awaitTermination()

    run_once()
    assert {
        (r.k, r.s, r.v) for r in spark.read.parquet(target).collect()
    } == {(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)}

    # second batch: update k=2, insert k=4
    batch2 = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "k INT, s STRING, v DOUBLE"
    )
    batch2.write.mode("append").parquet(str(src))
    run_once()
    assert {
        (r.k, r.s, r.v) for r in spark.read.parquet(target).collect()
    } == {(1, "a", 10.0), (2, "B", 22.0), (3, "c", 30.0), (4, "d", 40.0)}


def test_stream_ingest_dedup_matches_batch_path(spark, sf_dir, tmp_path):
    """Continuous-ingest dedup: streaming a batch of new docs through
    foreachBatch against a prebuilt corpus index yields EXACTLY the
    batch-mode survivor set, and the append is exactly-once."""
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.operators.dedup import (
        build_corpus_index,
        dedup_incremental_survivors,
    )
    from hpv_etl_code_spark.sources.registry import load_table
    from hpv_etl_code_spark.streaming.stream import stream_ingest_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "text")

    idx_path = str(tmp_path / "idx")
    build_corpus_index(corpus, "doc_id", "text").write.parquet(idx_path)
    corpus_index = spark.read.parquet(idx_path)

    src = tmp_path / "ingest_src"
    batch.write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.format("parquet").schema(batch.schema).load(str(src))
    )
    q = stream_ingest_dedup(
        stream,
        corpus_index,
        str(tmp_path / "accepted"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    want = {
        r.id
        for r in dedup_incremental_survivors(
            batch, None, "doc_id", "text", corpus_index=corpus_index
        ).collect()
    }
    got = {
        r.id for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    }
    assert got == want and len(got) > 0

    # restart with no new data: checkpoint must prevent re-append
    stream2 = (
        spark.readStream.format("parquet").schema(batch.schema).load(str(src))
    )
    q2 = stream_ingest_dedup(
        stream2,
        corpus_index,
        str(tmp_path / "accepted"),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "accepted")).count() == len(got)


def test_rocksdb_state_store_equals_default(spark, events_stream_dir):
    """The scale-grade state backend: Spark 4's RocksDBStateStoreProvider
    keeps streaming state off-heap with changelog checkpointing — the
    backend a 100 TB deployment runs — and must produce byte-identical
    window aggregates to the default (HDFS-backed) provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _stream(spark, events_stream_dir)
        windowed = tumbling_counts(stream, duration="1 hour", watermark="2 hours")
        run_to_memory_sink(windowed, "tumbling_rocksdb", output_mode="complete")
        got = {
            (str(r.window_start), r.event_type): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM tumbling_rocksdb").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    batch = tumbling_counts(spark.read.parquet(events_stream_dir), duration="1 hour")
    want = {
        (str(r.window_start), r.event_type): (r.n, r.sum_value)
        for r in batch.collect()
    }
    assert got == want and got
