"""Retraction-aware incremental materialized view (round 5).

``incremental_matview_orders`` (plans/analytics_queries.py) maintains an
aggregate under INSERTS; real CDC feeds also carry DELETES (and updates
as delete+insert pairs). This module maintains per-key COUNT / SUM /
AVG under a signed CDC stream with the delta-architecture shape:

- every micro-batch pre-aggregates its own deltas per key (map-side
  partial: Σ±1, Σ±cents — exact integer cents, order-independent) and
  APPENDS one tiny partial-aggregate part; the store is never rewritten
  in the hot path, exactly like the golden-record member store and the
  ingest-dedup corpus index;
- ``read_matview`` folds the parts (one hash aggregation over
  per-key-per-batch partials — store size is O(keys × batches), not
  O(events)); keys whose net count is zero disappear, matching the
  batch twin (a fully-retracted key has no surviving rows);
- ``compact_matview`` folds all parts into one (the LSM fold — read
  results identical before/after, test-locked).

Only RETRACTABLE aggregates are maintained (count/sum/avg — each has an
inverse). MIN/MAX are deliberately absent: they are not retractable
from a scalar state (deleting the current min needs the runner-up), and
the honest scale answer is a per-key value-multiset state or periodic
recompute — documented, not faked.

Exactness: values quantize to integer cents (HALF_UP on the shortest
repr — the streaming z-score discipline), so partial sums compose
associatively with no float drift and the stream ≡ batch equivalence is
exact, not approximate (tests/test_matview.py, incl. checkpoint
restart and full-retraction keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PART_SCHEMA = "user_id bigint, n_delta bigint, cents_delta bigint"


def cdc_deltas(batch: DataFrame) -> DataFrame:
    """Per-key signed partial aggregate of one CDC batch: op ∈
    {'I','D'} (updates arrive as D+I pairs), value quantized to exact
    2dp cents (matches CAST(value AS DECIMAL(12,2)) in both engines).
    Null values contribute sign to the count and 0 cents — the same on
    both the stream and batch paths by construction."""
    sign = F.when(F.col("op") == "D", F.lit(-1)).otherwise(F.lit(1))
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    return batch.groupBy("user_id").agg(
        F.sum(sign).cast("long").alias("n_delta"),
        F.sum(sign * F.coalesce(cents, F.lit(0))).cast("long").alias("cents_delta"),
    )


def cdc_matview_stream(stream_df: DataFrame, store_path: str, checkpoint: str):
    """foreachBatch maintenance: append one partial part per trigger.
    The checkpoint makes each append exactly-once across restarts."""

    def apply_batch(batch_df, batch_id):  # noqa: ANN001
        if batch_df.isEmpty():
            return
        cdc_deltas(batch_df).write.mode("append").parquet(f"{store_path}/parts")

    return (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_matview(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold the partial parts to the current view: (user_id, n,
    sum_value, avg_value). Net-zero keys drop (fully retracted)."""
    try:
        parts = spark.read.schema(_PART_SCHEMA).parquet(f"{store_path}/parts")
    except Exception:
        parts = spark.createDataFrame([], _PART_SCHEMA)
    return (
        parts.groupBy("user_id")
        .agg(
            F.sum("n_delta").cast("long").alias("n"),
            F.sum("cents_delta").cast("long").alias("cents"),
        )
        .filter(F.col("n") != 0)
        .select(
            "user_id",
            "n",
            F.round(F.col("cents").cast("double") / 100.0, 2).alias("sum_value"),
            F.round(
                F.col("cents").cast("double") / 100.0 / F.col("n").cast("double"), 6
            ).alias("avg_value"),
        )
    )


def compact_matview(spark: SparkSession, store_path: str) -> None:
    """Fold all parts into one (read-identical; runs between streaming
    runs, same staging discipline as compact_golden_store)."""
    import shutil

    folded = (
        spark.read.schema(_PART_SCHEMA)
        .parquet(f"{store_path}/parts")
        .groupBy("user_id")
        .agg(
            F.sum("n_delta").cast("long").alias("n_delta"),
            F.sum("cents_delta").cast("long").alias("cents_delta"),
        )
    )
    staged = f"{store_path}/parts__compacting"
    folded.write.mode("overwrite").parquet(staged)
    live = f"{store_path}/parts"
    shutil.rmtree(live)
    shutil.move(staged, live)


def cdc_net_batch(cdc: DataFrame) -> DataFrame:
    """Batch twin: the net view over the FULL CDC history in one
    aggregation — what the stream must equal after draining."""
    return (
        cdc_deltas(cdc)
        .filter(F.col("n_delta") != 0)
        .select(
            "user_id",
            F.col("n_delta").alias("n"),
            F.round(F.col("cents_delta").cast("double") / 100.0, 2).alias(
                "sum_value"
            ),
            F.round(
                F.col("cents_delta").cast("double")
                / 100.0
                / F.col("n_delta").cast("double"),
                6,
            ).alias("avg_value"),
        )
    )
