"""Banded range join — proximity joins without the O(n·m) blow-up.

A naive "|t_a − t_b| ≤ gap" join is a non-equi join: Spark would fall
back to broadcast-nested-loop (or a full cartesian at scale). The banded
idiom turns it into an EQUI join: quantize time into gap-sized buckets,
replicate one side into its neighboring buckets, join on (key, bucket),
then apply the exact predicate. Cost: one hash exchange + ≤3× expansion
of one side — linear, AQE-friendly, the standard interval-join strategy
(DuckDB/KDB do the same internally for ASOF/WINDOW joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proximity_self_join(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All pairs (id_a < id_b) sharing ``key`` with timestamps within
    ``max_gap_seconds``. Output: key, id_a, id_b, gap_seconds."""
    epoch = F.unix_timestamp(F.col(ts))
    bucket = F.floor(epoch / max_gap_seconds)

    a = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_a"),
        epoch.alias("e_a"),
        bucket.alias("bucket"),
    )
    b = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_b"),
        epoch.alias("e_b"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
    )
    # No pair-dedup needed: ``b`` is replicated into the three DISTINCT
    # buckets {floor(e_b/gap)−1, ·, ·+1} while ``a`` keeps its single
    # bucket, so a qualifying (a, b) pair matches exactly one replica
    # (a's bucket equals exactly one of the three); ``id_a < id_b`` kills
    # the mirrored ordering. A dropDuplicates here would add a full extra
    # shuffle for rows that are already unique (uniqueness is asserted in
    # tests/test_rangejoin.py).
    return (
        a.join(b, ["k", "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("e_a") - F.col("e_b")) <= max_gap_seconds)
        )
        .select(
            F.col("k").alias(key),
            "id_a",
            "id_b",
            F.abs(F.col("e_a") - F.col("e_b")).alias("gap_seconds"),
        )
    )
