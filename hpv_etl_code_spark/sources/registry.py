"""Source registry over the parquet star schema.

Reference analog: glob-based file discovery + per-file eager reads
(``/root/reference/src/main.py:17,24,27``). Here a source is a *name*
resolved to a lazy parquet scan; Catalyst prunes columns and pushes
predicates into the scan, and one multi-file scan replaces the
reference's per-file Python loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Canonical table names of the test corpus (TESTDATA.md). At production
# scale each name would map to a partitioned table/prefix instead of a
# single file — the API is the same.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast in any realistic deployment.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one registered table."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registered: {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
