"""As-of (backward-looking temporal) join — a custom operator Spark lacks.

The reference has no joins at all (SURVEY §2.6); this is part of the
engine's extended surface. Semantics: for every left row, attach the
right row with the greatest ``right_ts <= left_ts`` for the same key
(ties at equal timestamps match — inclusive), or NULLs if none.

Scale-first implementation — the union+window idiom, NOT a range join:
tag both inputs, union them, and run ONE window per key ordered by
(ts, side) taking the running ``last(right payload, ignoreNulls)``.
Cost: a single hash exchange on the key + per-partition sort — linear,
skew-tolerant under AQE, and immune to the O(|L|·|R|) blow-up a naive
non-equi join would produce at 100 TB. Right-side rows sort before left
rows at equal timestamps, which yields the inclusive (>=) match.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: EARLIEST right row at-or-after each left row
    (``right_ts >= left_ts``, ties match). Same union+window idiom as
    backward, with a descending scan: right rows sort after left rows at
    equal timestamps and the running ``last`` looks from the future side.
    """
    on = list(on)
    pay_cols = [right_ts, *[p for p in payload if p != right_ts]]

    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for p in pay_cols:
        l_tagged = l_tagged.withColumn(f"__pay_{p}", F.lit(None))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"__pay_{p}") for p in pay_cols],
    )
    r_schema = dict(r_tagged.dtypes)
    for p in pay_cols:
        l_tagged = l_tagged.withColumn(
            f"__pay_{p}", F.col(f"__pay_{p}").cast(r_schema[f"__pay_{p}"])
        )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for p in pay_cols:
        filled = filled.withColumn(
            f"__pay_{p}", F.last(f"__pay_{p}", ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("__side") == 1).drop("__ts", "__side")
    for p in pay_cols:
        out = out.withColumnRenamed(f"__pay_{p}", f"{p}{suffix}")
    return out


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest ``right`` state at or before each left row.

    ``payload``: right-side columns to attach (each renamed ``{col}{suffix}``).
    The right timestamp itself is attached as ``{right_ts}{suffix}``.
    """
    on = list(on)
    pay_cols = [right_ts, *[p for p in payload if p != right_ts]]

    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    for p in pay_cols:
        l_tagged = l_tagged.withColumn(f"__pay_{p}", F.lit(None))

    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"__pay_{p}") for p in pay_cols],
    )
    # cast right payload placeholders on the left to the right's types
    r_schema = dict(r_tagged.dtypes)
    for p in pay_cols:
        l_tagged = l_tagged.withColumn(
            f"__pay_{p}", F.col(f"__pay_{p}").cast(r_schema[f"__pay_{p}"])
        )

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for p in pay_cols:
        filled = filled.withColumn(
            f"__pay_{p}", F.last(f"__pay_{p}", ignorenulls=True).over(w)
        )

    out = filled.filter(F.col("__side") == 1).drop("__ts", "__side")
    for p in pay_cols:
        out = out.withColumnRenamed(f"__pay_{p}", f"{p}{suffix}")
    return out
