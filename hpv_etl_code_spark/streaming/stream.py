"""Structured Streaming wiring: sources, sinks, stateful dedup, and a
custom applyInPandasWithState operator.

Streaming-only pieces live here (they require an actual streaming
DataFrame); the window *semantics* live in windows.py and are shared
with batch. The reference has no streaming at all (SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def read_events_stream(
    spark: SparkSession, directory: str, schema: StructType
) -> DataFrame:
    """File-source stream over a directory of parquet drops — the
    standard at-least-once ingest pattern (new files become micro-batches;
    ``maxFilesPerTrigger`` throttles backfill)."""
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 8)
        .load(directory)
    )


def dedup_within_watermark(
    stream_df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming dedup: drops duplicate keys arriving within the
    watermark horizon; state is evicted as the watermark advances, so
    memory is bounded (unlike a naive global dropDuplicates)."""
    return stream_df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


USER_COUNT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("count", LongType())])


def _count_events(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user event count (custom stateful operator example)."""
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})


def running_user_counts(stream_df: DataFrame) -> DataFrame:
    """Arbitrary stateful processing via applyInPandasWithState: emits an
    updated per-user running count each micro-batch. State is one long
    per user — the minimal template for custom streaming operators
    (sessionization, CDC merge, feature windows...)."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _count_events,
        outputStructType=USER_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain an availableNow stream into an in-memory table (tests/dev)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
