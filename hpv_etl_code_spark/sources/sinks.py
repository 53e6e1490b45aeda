"""Sinks: the reference's truncate-and-reload contract, Spark-native.

Reference analog (``/root/reference/src/utils/database_util.py:10-62``):
TRUNCATE destination → ``write_pandas`` chunks → ROLLBACK on failure.
Spark's ``mode("overwrite")`` gives the same all-or-nothing semantics via
the file-commit protocol (staged writes + atomic commit) — no manual
rollback, and executors write partitions in parallel.

Scale option the reference lacks: ``partition_by`` + dynamic partition
overwrite replaces only the partitions present in the incoming data —
the incremental-load story for a 100 TB table where truncate-reload is
not viable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def overwrite_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    dynamic: bool = False,
) -> int:
    """Truncate-and-load a parquet destination; returns rows written
    (the reference prints this count, database_util.py:54)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if dynamic:
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)
    return df.sparkSession.read.parquet(path).count()
