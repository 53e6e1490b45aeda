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
