"""Physical-plan regression tests for the ML-eval rankers (ADVICE r5):
decile_lift_table / pr_curve_deciles / calibration_bins_brier (and the
AUC midrank + conformal rank added alongside) formerly ranked the full
events table with a bare ``row_number() OVER (ORDER BY ...)`` — an
``Exchange SinglePartition`` one-task global sort. They now rank via
the two-phase layout operators; these tests pin that plan shape."""

from __future__ import annotations

import re

import pytest

from hpv_etl_code_spark.plans.lint import assert_scalable
from hpv_etl_code_spark.plans.mleval_queries import (
    auc_purchase_score,
    calibration_bins_brier,
    conformal_interval_cents,
    decile_lift_table,
    pr_curve_deciles,
)

ENTRIES = [
    auc_purchase_score,
    decile_lift_table,
    pr_curve_deciles,
    calibration_bins_brier,
    conformal_interval_cents,
]


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("fn", ENTRIES, ids=lambda f: f.__name__)
def test_mleval_rankers_pass_scale_lint(spark, sf_dir, fn):
    assert_scalable(fn(spark, sf_dir))


@pytest.mark.parametrize("fn", ENTRIES, ids=lambda f: f.__name__)
def test_mleval_data_windows_are_bucket_partitioned(spark, sf_dir, fn):
    """Every window over data-sized input must carry the two-phase
    ``__bucket`` key; unpartitioned windows are allowed only over the
    bucket/decile METADATA frames (recognizable: they order by the
    bucket id or the 10-row decile/bin key, never by a raw data
    column)."""
    plan = _formatted_plan(fn(spark, sf_dir))
    ok_meta_orders = ("__bucket", "decile", "bin")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        parts: list[str] = []
        order: list[str] = []
        for a in (x.strip() for x in m.group(1).split(",")):
            if a.startswith("specifiedwindowframe"):
                break
            (order if (" ASC" in a or " DESC" in a) else parts).append(a)
        if any("__bucket" in p for p in parts):
            continue  # the parallel per-bucket window
        assert order and any(
            k in order[0] for k in ok_meta_orders
        ), f"unpartitioned data-ordered window: partitionBy={parts} orderBy={order}"
