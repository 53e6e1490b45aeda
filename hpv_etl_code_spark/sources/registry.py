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

    ``events.ts`` storage has varied across testdata generations:
    TIMESTAMP(NANOS) (read as long via
    ``spark.sql.legacy.parquet.nanosAsLong``, converted by truncating
    integer division — identical to DuckDB's ns→µs conversion) or µs
    TIMESTAMP_NTZ (reinterpreted as TIMESTAMP under the fixed UTC
    session tz). Both normalize to the same µs TIMESTAMP column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registered: {TABLES}")
    if name == "events":
        # runtime-settable SQL conf — the engine must work in ANY session
        # (the driver's verify builds its own), not just ours
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # µs-NTZ storage (current testdata). Present as TIMESTAMP so
            # event-time ops (withWatermark rejects NTZ) work downstream;
            # under the engine's fixed UTC session tz the cast is a pure
            # reinterpretation — wall-clock values are unchanged, so the
            # DuckDB oracle (which reads the same file as naive µs) still
            # stringifies identically.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
