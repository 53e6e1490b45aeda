"""Reshaping operators: unpivot (melt) and pivot.

Reference analogs:
- melt  → ``/root/reference/src/main.py:45`` (``df.melt(id_vars=...)``)
- pivot → ``/root/reference/src/main.py:53`` (``df.pivot(index=..., columns=..., values=...)``)

Spark-first mapping (SURVEY §2.3 R1/R2): ``DataFrame.unpivot`` compiles
to an ``Expand`` node — a narrow, shuffle-free transform that scales
linearly; ``groupBy().pivot(col, values).agg(...)`` with an *explicit*
values list skips Spark's extra distinct-discovery job.

Semantic divergence handled explicitly: pandas ``pivot`` raises on
duplicate keys (an implicit uniqueness assertion); Spark's
``pivot + first`` would silently pick one. :func:`check_unique_keys`
recreates the assertion as an opt-in eager check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long. ``values=None`` melts every non-id column (pandas parity)."""
    return df.unpivot(list(ids), list(values) if values else None, var_name, value_name)


def check_unique_keys(df: DataFrame, keys: Sequence[str]) -> None:
    """Eagerly assert (keys) are unique — pandas ``pivot`` parity (strict mode).

    This is an action (runs a count job); call it only in validation paths,
    not per-batch production flows.
    """
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(f"duplicate pivot keys, first: {dup[0].asDict()}")


def pivot(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence[str],
    agg: Column | None = None,
    strict: bool = False,
) -> DataFrame:
    """Long→wide with an explicit pivot-value list.

    ``agg`` defaults to ``first(value_col)`` (pandas ``pivot`` semantics
    given unique keys). ``strict=True`` adds the duplicate-key assertion.
    """
    if strict:
        check_unique_keys(df, [*keys, pivot_col])
    agg = agg if agg is not None else F.first(value_col)
    return df.groupBy(*keys).pivot(pivot_col, list(pivot_values)).agg(agg)
