"""Scan fan-out for row-group-bound inputs (optimization round 9).

The guide's §2.5 "input skew" case applies to this engine's bench corpus
directly: every ``/root/testdata/sf*.parquet`` table is written as ONE
parquet row group, and a parquet split only yields rows to the task
whose byte range contains the row-group midpoint — so a scan of a
single-row-group file runs as ONE task no matter how many cores the
session has. Every map-side-heavy operator downstream of such a scan
(per-gram md5 chains, decimal aggregation buffers, feature extraction)
therefore ran single-threaded on ``local[32]`` (measured: the round-9
bench's heaviest entries were all scan-task-bound, not shuffle-bound —
PROFILE.json shows ≤ 16 MB shuffled anywhere).

§2.5's remedy — "fix at the source if you can; otherwise repartition
immediately after the read" — is applied here as a SCALE-ADAPTIVE seam:
:func:`fan_out` inserts a round-robin repartition only when the source
table's file bytes cannot fill the session's cores at the configured
split size (``maxPartitionBytes``). At 100 TB the condition is false
for every real table (bytes ≫ cores × 128 MB, and production writers
emit 128 MB row groups anyway), so the repartition node VANISHES from
production plans — no constant tuned for local mode leaks into the
cluster plan shape.

Correctness: a keyless ``repartition(n)`` is retry-safe (Spark sorts
before round-robin partitioning, SPARK-23207) and every downstream
aggregate in this engine is order-independent by construction (exact
decimal / integer accumulation — the repo-wide oracle discipline), so
results are bit-identical with and without the fan-out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _table_bytes(sf_dir: str, tables: tuple[str, ...]) -> int:
    total = 0
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        try:
            if os.path.isdir(path):
                total += sum(
                    os.path.getsize(os.path.join(path, f))
                    for f in os.listdir(path)
                    if f.endswith(".parquet")
                )
            else:
                total += os.path.getsize(path)
        except OSError:
            # unreadable/remote source: assume big (no fan-out) — the
            # production-safe default
            return 1 << 60
    return total


def scan_starved(df: DataFrame, sf_dir: str, *tables: str) -> bool:
    """True when the scan of ``tables`` cannot reach the session's core
    count at the configured split size — i.e. per-task work downstream
    of the scan would underuse the cluster without a repartition."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    max_split = int(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        .lower()
        .replace("m", "000000")
        .replace("g", "000000000")
    )
    return _table_bytes(sf_dir, tables) < cores * max_split


def fan_partitions(
    df: DataFrame, sf_dir: str, *tables: str
) -> int | None:
    """The partition count an operator should fan a SERIAL intermediate
    out to, or ``None`` when the backing tables are big enough that the
    natural scan/shuffle parallelism already fills the cores (the
    production case — callers then add no plan node at all). The
    operator-level sibling of :func:`fan_out`, for stages that are not
    directly downstream of the scan (e.g. a banding explode reading a
    1-block checkpointed artifact, where AQE's small-shuffle coalescing
    left every downstream stage serial)."""
    if not tables:
        tables = ("documents",)
    if scan_starved(df, sf_dir, *tables):
        return df.sparkSession.sparkContext.defaultParallelism
    return None


def fan_out(
    df: DataFrame, sf_dir: str, *tables: str, key: str | None = None
) -> DataFrame:
    """Repartition ``df`` to the session's core count iff the backing
    ``tables`` under ``sf_dir`` are too small to fill the cores at the
    configured split size (single/few row groups — the bench corpus
    case). Project ``df`` down to the needed columns BEFORE calling
    this so the repartition exchange stays narrow (guide §2.3). At
    production scale the condition is false and ``df`` is returned
    unchanged — zero extra plan nodes.

    ``key``: repartition by hash of this high-cardinality column
    instead of round-robin. Keyless ``repartition(n)`` first pays a
    local SORT of the input (SPARK-23207 retry determinism) — on the
    one task this helper exists to relieve, that sort is itself the
    serial bottleneck; hashing a deterministic unique key spreads just
    as evenly (distinct values ≫ partitions, guide §2.5) with no sort
    and no retry hazard."""
    if not tables:
        tables = ("documents",)
    if scan_starved(df, sf_dir, *tables):
        n = df.sparkSession.sparkContext.defaultParallelism
        from pyspark.sql import functions as F

        if key is not None:
            return df.repartition(n, F.col(key))
        return df.repartition(n)
    return df
