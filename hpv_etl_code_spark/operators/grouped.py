"""Grouped-map operators (``applyInPandas``): per-group model fitting —
the Arrow grouped-map path for logic that is imperative per group.

Design notes (100 TB): ``applyInPandas`` shuffles once on the group key
and streams each group through Arrow into pandas — per-task memory is
bounded by the largest group, so keys must be finer than executor
memory (true for per-customer / per-document groups). Everything the
built-ins CAN express stays native; this module is the template for the
rest (state-space fits, changepoint detection, per-entity models).

Determinism contract: the OLS fit below runs in EXACT integer
arithmetic (day offsets × price cents) up to a final float division, so
the result is independent of row order, partitioning, AND engine — the
DuckDB oracle reproduces it hash-exactly. (A naive numpy ``lstsq``
would differ in ulps from any SQL engine's accumulation order.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

TREND_SCHEMA = StructType(
    [
        StructField("o_custkey", LongType()),
        StructField("n", LongType()),
        StructField("slope", DoubleType()),
        StructField("intercept", DoubleType()),
    ]
)


def per_group_trend_ols(
    df: DataFrame,
    key: str = "o_custkey",
    ts: str = "o_orderdate",
    val: str = "o_totalprice",
) -> DataFrame:
    """Per-group least-squares trend of ``val`` over time: one
    (key, n, slope, intercept) row per group, slope in value-units per
    day since the group's first observation.

    The per-group fit is a pandas function over ``applyInPandas``;
    inputs are pre-cast to exact integers (epoch seconds, price cents)
    with native expressions so the Python stage starts from
    engine-identical values.
    """
    pts = df.select(
        F.col(key).alias("o_custkey"),
        F.unix_timestamp(F.col(ts)).alias("e"),
        (F.col(val).cast("decimal(12,2)") * 100).cast("long").alias("yc"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        e, yc = pdf["e"], pdf["yc"]
        if e.notna().all() and yc.notna().all():
            e = e.astype("int64")
            x = (e - int(e.min())) // 86400
            yc = yc.astype("int64")
            sx = int(x.sum())
            sxx = int((x * x).sum())
            syc = int(yc.sum())
            sxyc = int((x * yc).sum())
        else:
            # dirty-data path: NULL cells arrive as NaN and skip the
            # sums exactly like the SQL twin's SUM-over-NULL semantics
            # (COUNT(*) still counts every row); values stay < 2^53 so
            # the float sums remain exact
            ev = e.dropna()
            x = (e - float(ev.min())) // 86400 if len(ev) else e
            sx = x.sum()
            sxx = (x * x).sum()
            syc = yc.sum()
            sxyc = (x * yc).sum()
        den = n * sxx - sx * sx
        if den == 0:
            slope = intercept = None
        else:
            # all intermediates < 2^53 → float conversions are exact;
            # the division order mirrors the SQL twin verbatim
            slope = (float(n * sxyc - sx * syc) / 100.0) / float(den)
            intercept = (float(syc) / 100.0 - slope * float(sx)) / float(n)
        return pd.DataFrame(
            {
                "o_custkey": [int(pdf["o_custkey"].iloc[0])],
                "n": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return pts.groupBy("o_custkey").applyInPandas(fit, TREND_SCHEMA)
