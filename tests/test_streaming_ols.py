"""Streaming OLS ≡ batch OLS: the regression's sufficient statistics
are plain mergeable sums, so the WHOLE entry (including the broadcast
dim join and the final IEEE chain) runs as a native Structured
Streaming aggregation in complete mode — no custom state. The final
emitted table must equal the batch entry EXACTLY (same decimal sums →
same doubles → same 6dp rounds), regardless of micro-batch cut points.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.inference_queries import (
    _OLS_EPOCH,
    ols_segment_trend,
    ols_trend,
)
from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.streaming.stream import run_to_memory_sink


@pytest.fixture(scope="module")
def orders_stream_dir(spark, sf_dir, tmp_path_factory):
    """orders split into several files so maxFilesPerTrigger=1 yields
    real multi-batch incremental aggregation."""
    path = str(tmp_path_factory.mktemp("orders_stream") / "orders")
    load_table(spark, sf_dir, "orders").repartition(4).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_stream_ols_matches_batch(spark, sf_dir, orders_stream_dir):
    schema = spark.read.parquet(orders_stream_dir).schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(orders_stream_dir)
    )
    customer = load_table(spark, sf_dir, "customer")
    j = stream.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        stream.o_custkey == customer.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.datediff(F.col("o_orderdate"), F.lit(_OLS_EPOCH).cast("date"))
        .cast("bigint")
        .alias("x"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    run_to_memory_sink(ols_trend(j), "ols_stream", output_mode="complete")
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM ols_stream").collect()
    }
    batch = {tuple(r) for r in ols_segment_trend(spark, sf_dir).collect()}
    assert got == batch
    assert len(got) > 1
