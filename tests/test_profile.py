"""The plan profiler must report REAL runtime metrics from the
DataFrame's own execution (the df.count()-executes-a-different-
QueryExecution trap is exactly what it guards against)."""

from __future__ import annotations

from hpv_etl_code_spark import catalog
from hpv_etl_code_spark.plans.profile import execute_and_profile


def test_profile_reports_runtime_metrics(spark, sf_dir):
    df = catalog.entries()["q3_shipping_priority"].fn(spark, sf_dir)
    prof = execute_and_profile(df)
    assert prof.rows == df.count()
    # q3 is two broadcast joins + one aggregate exchange
    assert prof.n_exchanges >= 1
    assert prof.n_broadcasts == 2
    assert prof.shuffle_bytes > 0 and prof.shuffle_records > 0
    assert prof.scan_files >= 3 and prof.scan_bytes > 0
    assert prof.spill_bytes == 0  # nothing should spill at test scale
    assert prof.nodes  # per-node drill-down populated


def test_profile_narrow_map_has_no_shuffle(spark, sf_dir):
    """A pure narrow map (quantization) must profile to zero shuffle —
    the property the 100 TB design notes claim for it."""
    df = catalog.entries()["embedding_quantize_int8"].fn(spark, sf_dir)
    prof = execute_and_profile(df)
    assert prof.n_exchanges == 0
    assert prof.shuffle_bytes == 0
