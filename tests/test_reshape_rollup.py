"""Unit tests: unpivot/pivot round-trip, strict pivot assertion, and the
grouping-sets rollup differentially tested against the reference's naive
three-pass copy-union algorithm (main.py:87-119) expressed in Spark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.reshape import check_unique_keys, pivot, unpivot
from hpv_etl_code_spark.operators.rollup import cube_rollup_labeled


def test_unpivot_pivot_roundtrip(spark):
    wide = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], ["k", "m1", "m2"]
    )
    long_df = unpivot(wide, ["k"], None, "var", "val")
    assert long_df.count() == 4
    back = pivot(long_df, ["k"], "var", "val", ["m1", "m2"])
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, wide.collect()))


def test_strict_pivot_raises_on_duplicates(spark):
    dup = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0)], ["k", "var", "val"]
    )
    with pytest.raises(ValueError, match="duplicate pivot keys"):
        pivot(dup, ["k"], "var", "val", ["x"], strict=True)
    check_unique_keys(dup.limit(1), ["k", "var"])  # unique slice passes


def test_cube_rollup_matches_naive_three_pass(spark):
    """The one-shuffle grouping-sets rewrite must equal the reference's
    base ∪ 'Both'-rollup ∪ 'All'-rollup algorithm."""
    df = spark.createDataFrame(
        [
            ("c1", "8", "F", 10, 1),
            ("c1", "8", "M", 20, 2),
            ("c1", "9", "F", 30, 3),
            ("c2", "8", "F", 40, 4),
            ("c2", "9", "M", 50, None),
        ],
        ["b", "y", "g", "t", "v"],
    )
    base = df.groupBy("b", "y", "g").agg(
        F.sum("t").alias("t"), F.sum("v").alias("v")
    )
    # reference algorithm: copy + overwrite label + groupby-sum + union
    both = (
        base.withColumn("g", F.lit("Both"))
        .groupBy("b", "y", "g")
        .agg(F.sum("t").alias("t"), F.sum("v").alias("v"))
    )
    widened = base.unionByName(both)
    years = (
        widened.withColumn("y", F.lit("All"))
        .groupBy("b", "y", "g")
        .agg(F.sum("t").alias("t"), F.sum("v").alias("v"))
    )
    naive = widened.unionByName(years)

    ours = cube_rollup_labeled(
        df,
        fixed_dims=["b"],
        labeled_dims={"g": "Both", "y": "All"},
        aggs=[F.sum("t").alias("t"), F.sum("v").alias("v")],
    ).select("b", "y", "g", "t", "v")

    assert sorted(map(tuple, ours.collect())) == sorted(
        map(tuple, naive.select("b", "y", "g", "t", "v").collect())
    )
