"""Streaming Welch A/B stats (8 exact integers of state per event_type)
must reproduce the batch entry bit-for-bit — the sufficient statistics
are exact integer sums, so the final row is micro-batch-cut-independent
— and survive a kill-and-restart through the checkpoint exactly once."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.olap_queries import ab_welch_ttest
from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.stateful import ab_stats_stream
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink

_COLS = ("n_a", "n_b", "mean_a", "mean_b", "t_stat", "welch_df")


def _final_rows(df):
    """Latest update per event_type = the row with the largest total n
    (monotonically growing — exact integer state)."""
    w = (
        F.coalesce(F.col("n_a"), F.lit(0)) + F.coalesce(F.col("n_b"), F.lit(0))
    ).alias("__tot")
    ranked = df.select("*", w).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.col("__tot").desc())
        ),
    )
    return {
        r.event_type: tuple(getattr(r, c) for c in _COLS)
        for r in ranked.filter(F.col("__rk") == 1).collect()
    }


def test_stream_ab_stats_matches_batch(spark, ordered_stream_dir, sf_dir):
    schema = spark.read.parquet(ordered_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(ordered_stream_dir)
    )
    run_to_memory_sink(
        ab_stats_stream(stream), "ab_stateful", output_mode="update"
    )
    got = _final_rows(spark.sql("SELECT * FROM ab_stateful"))
    assert got

    # the ordered fixture holds exactly the events table
    assert (
        spark.read.parquet(ordered_stream_dir).count()
        == load_table(spark, sf_dir, "events").count()
    )
    batch = {
        r.event_type: tuple(getattr(r, c) for c in _COLS)
        for r in ab_welch_ttest(spark, sf_dir).collect()
    }
    assert got == batch  # bit-identical, incl. the rounded doubles


def test_stream_ab_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart: half the events, stop, the rest arrive, the
    SAME checkpoint resumes — the final Welch row must equal the batch
    entry over ALL events (a reprocessed first batch would double the
    integer sums; a lost state would halve them)."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = (
            spark.readStream.format("parquet").schema(schema).load(src)
        )
        q = (
            ab_stats_stream(stream)
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
    run_once()  # resume from the same checkpoint

    got = _final_rows(spark.read.parquet(out))
    batch = {
        r.event_type: tuple(getattr(r, c) for c in _COLS)
        for r in ab_welch_ttest(spark, sf_dir).collect()
    }
    assert got == batch


def test_stream_ab_tolerates_null_user_and_value(spark, tmp_path):
    """Dirty-data invariant: NULL user_id rows vanish (the batch md5
    arm of NULL is NULL — never picked); NULL values count toward the
    arm's n but not its sums — both without exceptions."""
    rows = [
        (1, "2024-03-01 09:00:00", "t", 101, 5.25),
        (2, "2024-03-01 10:00:00", "t", None, 9.99),
        (3, "2024-03-01 11:00:00", "t", 102, None),
        (4, "2024-03-01 12:00:00", "t", 103, 1.75),
        (5, "2024-03-01 13:00:00", "t", 104, 2.50),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, event_type string,"
        " user_id bigint, value double",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type",
        "user_id", "value",
    )
    src = str(tmp_path / "null_ab")
    ev.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(ev.schema)
        .load(src)
    )
    run_to_memory_sink(
        ab_stats_stream(stream), "ab_nulls", output_mode="update"
    )
    got = _final_rows(spark.sql("SELECT * FROM ab_nulls"))
    # mirror the batch expressions on the same frame
    from hpv_etl_code_spark.plans import olap_queries as oq

    ev.createOrReplaceTempView("__ab_null_events")
    arm = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(2),
    )
    assert oq is not None  # the entry-level twin is checked above
    per_arm = (
        ev.withColumn("arm", arm)
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sx"),
        )
        .filter(F.col("arm").isNotNull())
    )
    n_by_arm = {r.arm: r.n for r in per_arm.collect()}
    t_row = got["t"]
    assert (t_row[0] or 0) == n_by_arm.get(0, 0)
    assert (t_row[1] or 0) == n_by_arm.get(1, 0)
    assert (t_row[0] or 0) + (t_row[1] or 0) == 4  # null-uid row dropped
