"""Time-window aggregations over the ``events`` table.

The reference is strictly batch (truncate-reload, SURVEY §2.9); this is
the engine's streaming surface. Every function here is written against a
plain DataFrame and works in BOTH modes: pass a batch ``spark.read``
frame (oracle-testable — F.window/session_window are ordinary
expressions) or a ``spark.readStream`` frame (then add a watermark via
the ``watermark=`` argument and these become incremental stateful
aggregations with late-data handling).

Scale: windowed aggregation shuffles once on (window, keys); state per
window is bounded by the watermark horizon — the Structured Streaming
state store evicts windows older than the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def ensure_event_time(df: DataFrame, ts: str = "ts") -> DataFrame:
    """Watermarks reject TIMESTAMP_NTZ event-time columns; reinterpret as
    TIMESTAMP (value-preserving under the engine's fixed UTC session tz)
    so NTZ-stored sources (current testdata parquet) stream unchanged."""
    if dict(df.dtypes).get(ts) == "timestamp_ntz":
        df = df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df


def _maybe_watermark(df: DataFrame, ts: str, watermark: str | None) -> DataFrame:
    return ensure_event_time(df, ts).withWatermark(ts, watermark) if watermark else df


def tumbling_counts(
    df: DataFrame,
    ts: str = "ts",
    duration: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per (tumbling window, event_type): count + exact value sum."""
    df = _maybe_watermark(df, ts, watermark)
    return (
        df.groupBy(F.window(ts, duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts: str = "ts",
    duration: str = "1 day",
    slide: str = "12 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows (the
    Expand is narrow; the shuffle keys on window+type as usual)."""
    df = _maybe_watermark(df, ts, watermark)
    return (
        df.groupBy(F.window(ts, duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_windows(
    df: DataFrame,
    ts: str = "ts",
    gap: str = "4 hours",
    key: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows (merge events within ``gap`` of the
    previous event). Output: key, session_start, n_events, sum_value.

    Note: Spark's session_window end = last event + gap, so only the
    start is emitted (it equals the first event's timestamp — the
    portable, oracle-comparable quantity)."""
    df = _maybe_watermark(df, ts, watermark)
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
