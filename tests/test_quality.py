"""Data-quality gate and deterministic-split tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.quality import data_quality_report, split_assign
from hpv_etl_code_spark.sources.registry import load_table


def test_split_is_stable_and_subset_invariant(spark, sf_dir):
    """The label of a row depends only on its key: assigning on the full
    table and on a filtered subset must agree row-for-row (the property
    randomSplit lacks)."""
    d = load_table(spark, sf_dir, "documents")
    full = split_assign(d, "doc_id").select("doc_id", "split")
    subset = split_assign(d.filter(F.col("doc_id") % 3 == 0), "doc_id").select(
        "doc_id", F.col("split").alias("split2")
    )
    disagree = full.join(subset, "doc_id").filter(
        F.col("split") != F.col("split2")
    )
    assert disagree.count() == 0


def test_split_fractions_roughly_hold(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    counts = {
        r.split: r.n
        for r in split_assign(d, "doc_id", 0.2, 0.2)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert counts["train"] > counts.get("val", 0)
    # 20%±10 points tolerance at tiny SF — binomial spread
    assert abs(counts.get("val", 0) / total - 0.2) < 0.1


def test_dq_report_flags_injected_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (None, 99.0), (3, -5.0)], "k int, v double"
    )
    parent = spark.createDataFrame([(1,), (3,)], "k int")
    rep = {
        r.check_name: r.n_violations
        for r in data_quality_report(
            df,
            not_null=("k",),
            unique_key=("k",),
            fk=(("k", parent, "k"),),
            ranges=(("v", 0.0, 50.0),),
        ).collect()
    }
    assert rep["not_null:k"] == 1
    assert rep["unique:k"] == 1  # duplicate pair → 1 extra row
    assert rep["fk:k"] == 0  # nulls excluded; 1 and 3 both present
    assert rep["range:v"] == 2  # 99.0 and -5.0


def test_dq_report_clean_table_is_all_zero(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rep = data_quality_report(
        o, not_null=("o_orderkey",), unique_key=("o_orderkey",)
    )
    assert rep.filter(F.col("n_violations") != 0).count() == 0


def test_table_diff_classifies_all_four_ways(spark):
    from hpv_etl_code_spark.operators.reconcile import table_diff

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, "e")], "k int, v string"
    )
    got = {r.k: r.change_type for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",  # NULL -> value is a change (null-safe compare)
        4: "removed",
        5: "added",
    }


def test_diff_summary_counts_match_diff(spark, sf_dir):
    from hpv_etl_code_spark.operators.reconcile import diff_summary, table_diff

    o = load_table(spark, sf_dir, "orders")
    changed = o.withColumn(
        "o_totalprice",
        F.when(F.pmod("o_orderkey", F.lit(10)) == 0, 0.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    summary = {
        r.change_type: r.n
        for r in diff_summary(o, changed, ["o_orderkey"]).collect()
    }
    n_changed = table_diff(o, changed, ["o_orderkey"]).filter(
        F.col("change_type") == "changed"
    ).count()
    assert summary["changed"] == n_changed > 0
    assert "added" not in summary and "removed" not in summary


def test_split_and_diff_handle_empty_inputs(spark):
    from hpv_etl_code_spark.operators.quality import split_assign
    from hpv_etl_code_spark.operators.reconcile import diff_summary

    empty = spark.createDataFrame([], "k long, v string")
    assert split_assign(empty, "k").count() == 0
    assert diff_summary(empty, empty, ["k"]).count() == 0
