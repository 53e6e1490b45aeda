"""Labeled grouping-sets rollups — the reference's flagship rewrite.

The reference computes its two rollup levels as three passes over the
data: copy frame + overwrite ``Gender_Name='Both'`` + groupby-sum + union
(``/root/reference/src/main.py:87-100``), then the same for
``Year_Group_Number='All'`` over the widened frame
(``src/main.py:104-119``). Together the three unions produce every
(gender-level × year-level) combination — i.e. ``CUBE(gender, year)``
(SURVEY §2.5 A1/A2).

Here that is ONE pass: ``DataFrame.groupingSets`` emits an ``Expand``
node and a single partial/final hash aggregation around ONE shuffle —
at 100 TB this replaces 3 full scans + 2 shuffles + 2 unions with one
scan and one exchange. Rollup rows are labeled (``'Both'``/``'All'``)
via ``GROUPING()`` flags so genuine NULL dimension values are never
confused with rollup placeholders.

Divergence (documented, SURVEY §2.5 A3): sum over an all-NULL group is
NULL here (SQL semantics) vs 0 in pandas; and null-valued *grouping keys*
form real groups here while pandas ``groupby`` silently drops them.
Both are strictly-more-defined behaviors.
"""

from __future__ import annotations

from itertools import combinations
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cube_rollup_labeled(
    df: DataFrame,
    fixed_dims: Sequence[str],
    labeled_dims: Mapping[str, str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Aggregate over all subsets of ``labeled_dims`` (cube), keeping
    ``fixed_dims`` in every grouping set; rolled-up dimensions take their
    configured label instead of NULL.

    ``aggs`` must be pre-aliased aggregate Columns.
    """
    label_cols = list(labeled_dims)
    sets: list[list[str]] = [
        [*fixed_dims, *combo]
        for r in range(len(label_cols), -1, -1)
        for combo in combinations(label_cols, r)
    ]
    flags = [F.grouping(c).alias(f"__grouping_{c}") for c in label_cols]
    out = df.groupingSets(sets, *fixed_dims, *label_cols).agg(*aggs, *flags)
    for c, label in labeled_dims.items():
        out = out.withColumn(
            c,
            F.when(F.col(f"__grouping_{c}") == 1, F.lit(label)).otherwise(F.col(c)),
        )
    return out.drop(*[f"__grouping_{c}" for c in label_cols])
