"""Custom stateful streaming operator: event-time sessionization.

``session_window`` (streaming/windows.py) covers the built-in case;
this module is the template for semantics the built-ins CANNOT express
(per-session custom payloads, conditional session splits, CDC-style
state machines): arbitrary per-key state via ``applyInPandasWithState``
with EVENT-TIME timeouts.

Mechanics:
- state per user = the one open session ``(start, last_ts, n, sum)``;
- each micro-batch extends or closes it (gap exceeded → emit closed
  session, open a new one);
- the event-time timeout fires when the WATERMARK passes
  ``last_ts + gap`` — closing sessions whose user went quiet, which a
  batch operator can never do incrementally;
- state is one tiny tuple per active user: memory is bounded by active
  keys, not history — the property that makes this run forever.

Ordering contract: events for a key must arrive non-decreasing in time
ACROSS micro-batches (within a batch they are sorted here). The file
source preserves file order; out-of-order arrivals within the watermark
would need a buffer-in-state variant (same skeleton, state holds a
small heap).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_EPOCH = dt.datetime(1970, 1, 1)


def _us(ts: dt.datetime) -> int:
    return int((ts - _EPOCH).total_seconds() * 1_000_000)


def _make_sessionizer(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        user_id = key[0]

        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            closed.append((user_id, start_us, last_us, n, sv))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            events = pd.concat(list(pdfs), ignore_index=True)
            if len(events):
                events = events.sort_values("ts")
                for ts, value in zip(events["ts"], events["value"]):
                    t = _us(ts.to_pydatetime().replace(tzinfo=None))
                    if cur is None:
                        cur = [t, t, 0, 0.0]
                    elif t - cur[1] > gap_us:
                        closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                        cur = [t, t, 0, 0.0]
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += float(value)
            if cur is not None:
                deadline_ms = (cur[1] + gap_us) // 1000
                if deadline_ms <= state.getCurrentWatermarkMs():
                    # watermark already passed this session's deadline
                    # (possible when this batch advanced it) — close now;
                    # a timeout in the past would be rejected
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    if state.exists:
                        state.remove()
                else:
                    state.update(tuple(cur))
                    state.setTimeoutTimestamp(deadline_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [_EPOCH + dt.timedelta(microseconds=c[1]) for c in closed],
                    "session_end": [_EPOCH + dt.timedelta(microseconds=c[2]) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] for c in closed],
                }
            )

    return sessionize


_GAP_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _parse_gap(gap: str) -> int:
    """'30 minutes' → 1800 (same grammar subset as Spark intervals)."""
    parts = gap.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _GAP_UNITS:
        raise ValueError(f"unparseable session gap {gap!r}; use e.g. '30 minutes'")
    return int(parts[0]) * _GAP_UNITS[parts[1].lower()]


def sessionize_stream(
    stream_df: DataFrame,
    gap: str = "4 hours",
    gap_seconds: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit CLOSED sessions (user, start, end, n, sum) as they expire.

    Input must carry ``user_id``, ``ts`` (event time), ``value``.
    ``gap`` is parsed into seconds unless ``gap_seconds`` overrides it.
    """
    if gap_seconds is None:
        gap_seconds = _parse_gap(gap)
    from .windows import ensure_event_time

    return (
        ensure_event_time(stream_df, "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
