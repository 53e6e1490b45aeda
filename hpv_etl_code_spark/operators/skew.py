"""Skew-mitigation utilities: salted joins and bucketed co-located joins.

At 100 TB a single hot key (one borough with 10⁹ rows, one user with
10⁷ events) turns a shuffle join into one straggler task. AQE's skew-join
splitting handles sort-merge cases adaptively; :func:`salted_join` is the
explicit alternative that also works for aggregations feeding joins:
replicate the small side R times, scatter the big side across R salted
partitions — the hot key's rows spread over R tasks.

:func:`write_bucketed` persists both join sides bucketed by the join key
so repeated joins are exchange-free (co-located scan-side join) — the
"reuse a partitioning across stages" story for pipelines that join the
same fact tables every run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join big⋈small on a skewed key by salting.

    big rows get a random-ish deterministic salt (hash of all columns
    mod R — NOT rand(), so retries/speculative tasks see stable values);
    small rows are replicated R times. Output equals the plain join for
    ``how`` in {'inner', 'left'} — the only supported types: with
    right/full outer, every unmatched small-side replica would surface
    as its own output row (R copies), diverging from the plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(outer variants would emit unmatched small-side rows once per salt)"
        )
    salt_b = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    b = big.withColumn("__salt", salt_b)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table: joins/aggs on the
    bucket key skip the exchange entirely when both sides share the
    layout."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
