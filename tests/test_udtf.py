"""UDTF registration + lateral-join usage (SURVEY §2.10)."""

from __future__ import annotations

from hpv_etl_code_spark.functions.tablefuncs import (
    ExplodeNgrams,
    register_table_functions,
)


def test_udtf_direct_call(spark):
    from pyspark.sql.functions import lit

    rows = ExplodeNgrams(lit("a b c d"), lit(2)).collect()
    assert [(r.ngram, r.pos) for r in rows] == [
        ("a_b", 0),
        ("b_c", 1),
        ("c_d", 2),
    ]


def test_udtf_lateral_sql(spark, sf_dir):
    register_table_functions(spark)
    from hpv_etl_code_spark.sources.registry import register_views

    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT d.doc_id, g.ngram, g.pos
        FROM documents d, LATERAL explode_ngrams(d.text, 3) g
        WHERE d.doc_id = 0
        """
    ).collect()
    assert out and all(len(r.ngram.split("_")) == 3 for r in out)
    assert [r.pos for r in out] == list(range(len(out)))
