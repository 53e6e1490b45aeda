"""Table reconciliation: keyed diff of two datasets.

The migration/CDC-audit primitive: given old and new snapshots keyed by
the same columns, classify every key as added / removed / changed /
unchanged — ONE full-outer shuffle join on the key plus a row-local
null-safe struct comparison. No collects, no per-column jobs; at
100 TB both sides shuffle once on the key (or zero times if both are
bucketed on it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key change classification between two snapshots.

    Output: key columns + ``change_type`` ∈
    {'added','removed','changed','unchanged'} ('added' = present only in
    ``right``). Value comparison is null-safe over a struct of
    ``compare_cols`` (default: all shared non-key columns, in ``left``'s
    order) so NULL→value and value→NULL both count as changes."""
    if compare_cols is None:
        shared = set(left.columns) & set(right.columns)
        compare_cols = [
            c for c in left.columns if c in shared and c not in key_cols
        ]
    lv = F.struct(*[F.col(c) for c in compare_cols]).alias("__lv")
    rv = F.struct(*[F.col(c) for c in compare_cols]).alias("__rv")
    l_side = left.select(*key_cols, lv)
    r_side = right.select(*key_cols, rv)
    j = l_side.join(r_side, list(key_cols), "full_outer")
    change = (
        F.when(F.col("__lv").isNull(), F.lit("added"))
        .when(F.col("__rv").isNull(), F.lit("removed"))
        .when(F.col("__lv").eqNullSafe(F.col("__rv")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*key_cols, change.alias("change_type"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(change_type, n) rollup of :func:`table_diff` — the one-line
    reconciliation report."""
    return (
        table_diff(left, right, key_cols, compare_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
