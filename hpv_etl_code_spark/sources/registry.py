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
    """Lazy parquet scan for one registered table.

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark reads as a
    long (``spark.sql.legacy.parquet.nanosAsLong``); convert to a µs
    timestamp here via integer division (truncation — identical to
    DuckDB's ns→µs conversion, keeping the oracle bit-exact).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registered: {TABLES}")
    if name == "events":
        # runtime-settable SQL conf — the engine must work in ANY session
        # (the driver's verify builds its own), not just ours
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
