"""pandas-API parity: the reference is literal pandas
(``/root/reference/src/main.py`` — melt/pivot/concat/groupby); show a
reference user can keep those exact idioms through ``pyspark.pandas``
and get distributed plans, AND that they agree with this engine's
native operators."""

from __future__ import annotations

import pytest

import pyspark.pandas as ps
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.reshape import pivot, unpivot


@pytest.fixture()
def wide_psdf(spark):
    sdf = spark.createDataFrame(
        [
            ("camden", "10", "8"),
            ("hackney", "20", "15"),
            ("newham", "30", "22"),
        ],
        ["Local authority", "Year 8 number", "Year 8 number vaccinated"],
    )
    return sdf.pandas_api()


def test_ps_melt_matches_native_unpivot(spark, wide_psdf):
    # reference main.py:45 — identical call shape, distributed execution
    melted = wide_psdf.melt(
        id_vars=["Local authority"], var_name="Category", value_name="Value"
    )
    got = {
        (r["Local authority"], r.Category, r.Value)
        for _, r in melted.to_pandas().iterrows()
    }
    native = unpivot(
        wide_psdf.to_spark(), ["Local authority"], None, "Category", "Value"
    )
    want = {tuple(r) for r in native.collect()}
    assert got == want and len(got) == 6


def test_ps_groupby_sum_matches_native(spark, sf_dir):
    from hpv_etl_code_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    psdf = li.pandas_api()
    # reference main.py:91-97 idiom: groupby(...).sum()
    got = psdf.groupby("l_returnflag")["l_quantity"].sum().to_pandas().to_dict()
    want = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6
