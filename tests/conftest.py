from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hpv_etl_code_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="pytest", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    # unpersist the shared corpus-signature cache so the session ends
    # with no lingering persisted frames (exercises the teardown path)
    from hpv_etl_code_spark.plans.shared_cache import clear_cache

    clear_cache()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark_session_holder(spark):
    """Alias fixture for hypothesis tests (function-scoped @given bodies
    reusing the session-scoped SparkSession)."""
    return spark


@pytest.fixture(scope="session")
def ordered_stream_dir(spark, sf_dir, tmp_path_factory):
    """Time-ordered file drops so events per key arrive non-decreasing
    across micro-batches — the operator's documented ordering contract.

    The file stream source orders files by MODIFICATION TIME, so each
    time-range chunk is written as its own job and given a strictly
    increasing mtime (a same-mtime directory would be consumed in
    arbitrary order and everything before the last chunk becomes
    late data)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from hpv_etl_code_spark.sources.registry import load_table

    root = tmp_path_factory.mktemp("ordered_events")
    d = root / "data"
    d.mkdir()
    ev = load_table(spark, sf_dir, "events")
    bounds = ["2024-01-08", "2024-01-15", "2024-01-22", "2100-01-01"]
    lo = "1970-01-01"
    for i, hi in enumerate(bounds):
        chunk_dir = str(root / f"chunk{i}")
        (
            ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
            .coalesce(1)
            .sortWithinPartitions("ts")
            .write.parquet(chunk_dir)
        )
        part = glob.glob(chunk_dir + "/part-*.parquet")[0]
        dest = str(d / f"{i:05d}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))
        lo = hi
    return str(d)
