"""Differential-test utility mirroring the driver's correctness gate:

run a Spark catalog query and its DuckDB oracle side-by-side, then
compare row-count + column-name set + order-insensitive canonicalized
values. Stricter than the driver in one way: values are compared
exactly (after canonical string normalization), so any float
nondeterminism in our queries shows up here first.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.IOException:
            # Spark writes a DIRECTORY named <t>.parquet; glob inside it
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
            )
    return con


def _canon(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips float64 exactly; deterministic queries match bit-for-bit
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, sql: str, sf_dir: str, approx: int | None = None) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive).

    approx: if set, round floats to that many significant decimals before
    comparing (for queries that are intentionally float-tolerant).
    """
    con = duck_con(sf_dir)
    orc = con.sql(sql)
    o_cols = [c.lower() for c in orc.columns]
    o_rows = orc.fetchall()
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    if approx is not None:
        def soften(rows, cols):
            out = []
            for r in rows:
                out.append(tuple(
                    round(v, approx) if isinstance(v, float) and not math.isnan(v) else v
                    for v in r
                ))
            return out
        s_rows = soften(s_rows, s_cols)
        o_rows = soften(o_rows, o_cols)

    s_set = _rowset(s_cols, s_rows)
    o_set = _rowset(o_cols, o_rows)
    if s_set != o_set:
        diff_s = [r for r in s_set if r not in set(o_set)][:5]
        diff_o = [r for r in o_set if r not in set(s_set)][:5]
        raise AssertionError(
            f"value mismatch.\n spark-only (≤5): {diff_s}\n oracle-only (≤5): {diff_o}"
        )
