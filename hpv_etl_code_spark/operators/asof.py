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

The whole right payload travels as ONE struct through the window fill:
``last(struct, ignoreNulls)`` — the struct row is non-null even when
individual fields are NULL, so the matched right row arrives intact.
(Filling each payload column independently would tear rows: a NULL
field in the matched row would be papered over with the value from an
OLDER right row.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    suffix: str,
    forward: bool,
) -> DataFrame:
    on = list(on)
    pay_cols = [right_ts, *[p for p in payload if p != right_ts]]

    # the right row travels as one struct so matched fields never mix
    # across different right rows (torn-row hazard)
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(p).alias(p) for p in pay_cols]).alias("__pay"),
    )
    pay_type = r_tagged.schema["__pay"].dataType
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__pay", F.lit(None).cast(pay_type))
    )

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    order = F.col("__ts").desc() if forward else F.col("__ts").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__pay", F.last("__pay", ignorenulls=True).over(w))

    out = filled.filter(F.col("__side") == 1)
    for p in pay_cols:
        out = out.withColumn(f"{p}{suffix}", F.col("__pay").getField(p))
    return out.drop("__ts", "__side", "__pay")


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
    return _asof_join(
        left, right, on, left_ts, right_ts, payload, suffix, forward=True
    )


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
    return _asof_join(
        left, right, on, left_ts, right_ts, payload, suffix, forward=False
    )
