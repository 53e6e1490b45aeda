"""Merge/upsert — the incremental-load path beyond truncate-reload.

The reference's only load mode is TRUNCATE + full reload
(``/root/reference/src/utils/database_util.py:39``, ``README.md:57``).
At 100 TB that is not viable; the standard replacement is MERGE:
combine the existing target with an updates batch, updates winning on
key collision, appending otherwise. Without a transactional table
format this engine expresses MERGE as a plan (full outer join on the
key — one shuffle, or exchange-free if both sides are bucketed by the
key via operators/skew.write_bucketed), then rewrites atomically via
the overwrite sink or dynamic partition overwrite for partition-scoped
batches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``target``; new keys
    append; unmatched target rows pass through. Columns = target's.

    Implemented as target ⟕anti(updates) ∪ updates — one shuffle each
    side on the key, no row-by-row driver logic. (A full-outer-join
    variant would be needed for column-wise partial updates.)
    """
    keys = list(keys)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))
