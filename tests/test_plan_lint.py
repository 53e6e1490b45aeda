"""Plan-linter tests: each anti-pattern detector fires on a deliberately
bad plan and stays quiet on the engine's own (plan-disciplined) entries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.lint import assert_scalable, lint_plan
from hpv_etl_code_spark.sources.registry import load_table


def _rules(df):
    return {f.rule for f in lint_plan(df)}


def test_detects_cartesian_product(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # non-equi join with data on both sides → cartesian/nested-loop
    bad = o.crossJoin(n)
    assert _rules(bad) & {"cartesian-product", "nested-loop-cross-join"}


def test_detects_row_python_udf(spark, sf_dir):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())  # deliberate anti-pattern
    bad = load_table(spark, sf_dir, "orders").select(slow("o_orderkey"))
    assert "row-python-udf" in _rules(bad)


def test_detects_unpartitioned_window(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    bad = o.withColumn("rn", F.row_number().over(Window.orderBy("o_orderkey")))
    assert "single-partition-data-exchange" in _rules(bad)


def test_detects_global_sort_without_limit(spark, sf_dir):
    bad = load_table(spark, sf_dir, "orders").orderBy("o_totalprice")
    assert "global-sort-no-limit" in _rules(bad)


def test_clean_on_disciplined_plans(spark, sf_dir):
    from hpv_etl_code_spark import catalog

    for name in (
        "pricing_summary",
        "join_broadcast_dims",
        "window_topk_per_group",
        "sort_limit_top_orders",
        "global_index_orders",
        "bm25_topk_docs",
        "latest_per_key",
        # round-9 session-3 families stay lint-clean (the DSIR
        # grand-total attach is the excused keys=[] idiom)
        "dup_passage_spans",
        "passage_strip_incremental",
        "dsir_importance_weights",
        "dsir_mixture_shift",
        "bpe_encode_corpus",
        "decontam_passage_scrub",
        "llm_corpus_pipeline_select",
    ):
        df = catalog.entries()[name].fn(spark, sf_dir)
        assert_scalable(df)


def test_assert_scalable_raises_with_rule_names(spark, sf_dir):
    bad = load_table(spark, sf_dir, "orders").orderBy("o_totalprice")
    with pytest.raises(AssertionError, match="global-sort-no-limit"):
        assert_scalable(bad)
    assert_scalable(bad, allow=("global-sort-no-limit",))  # allow-list works
