"""Unit tests: as-of join semantics on a hand-built fixture; sink
overwrite round-trip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.asof import asof_join_backward
from hpv_etl_code_spark.sources.sinks import overwrite_parquet


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "e1"),   # before any state → NULL
            (1, _ts("2024-01-01T12:00:00"), "e2"),   # exactly at state s1 → s1 (inclusive)
            (1, _ts("2024-01-01T15:00:00"), "e3"),   # after s2 → s2
            (2, _ts("2024-01-01T09:00:00"), "e4"),   # key with no right rows → NULL
        ],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T12:00:00"), "s1"),
            (1, _ts("2024-01-01T14:00:00"), "s2"),
        ],
        ["k", "ts", "state"],
    )
    out = asof_join_backward(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload=["ts", "state"]
    )
    got = {r.name: r.state_asof for r in out.collect()}
    assert got == {"e1": None, "e2": "s1", "e3": "s2", "e4": None}
    assert out.count() == left.count()  # left-join cardinality preserved


def test_asof_matched_row_travels_whole(spark):
    """Torn-row regression: when the matched right row has NULL in one
    payload column, the output must carry that NULL — never borrow the
    field from an OLDER right row."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T15:00:00"), "e1")], ["k", "ts", "name"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "old-label", 1.0),
            (1, _ts("2024-01-01T14:00:00"), None, 2.0),  # matched row, NULL label
        ],
        ["k", "ts", "label", "score"],
    )
    out = asof_join_backward(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        payload=["ts", "label", "score"],
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.ts_asof == _ts("2024-01-01T14:00:00")
    assert row.score_asof == 2.0
    assert row.label_asof is None  # NOT 'old-label'


def test_asof_forward_matched_row_travels_whole(spark):
    from hpv_etl_code_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), "e1")], ["k", "ts", "name"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), None, 2.0),  # matched row, NULL label
            (1, _ts("2024-01-01T14:00:00"), "later-label", 1.0),
        ],
        ["k", "ts", "label", "score"],
    )
    out = asof_join_forward(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        payload=["ts", "label", "score"],
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.ts_asof == _ts("2024-01-01T10:00:00")
    assert row.score_asof == 2.0
    assert row.label_asof is None  # NOT 'later-label'


def test_overwrite_parquet_truncate_reload(spark, tmp_path):
    path = str(tmp_path / "sink")
    df1 = spark.range(100).withColumn("v", F.col("id") * 2)
    assert overwrite_parquet(df1, path) == 100
    # second overwrite replaces, never appends (truncate-reload parity)
    df2 = spark.range(10)
    assert overwrite_parquet(df2, path) == 10
    assert spark.read.parquet(path).count() == 10


def test_overwrite_jdbc_truncate_reload(spark):
    """The warehouse truncate+load path, exercised for real against
    Spark's bundled embedded Derby (same JVM in local mode)."""
    from hpv_etl_code_spark.sources.sinks import overwrite_jdbc, read_jdbc

    url = "jdbc:derby:memory:hpv_sink_test;create=true"
    df1 = spark.range(100).withColumn("v", F.col("id") * 2)
    overwrite_jdbc(df1, url, "t_sink", truncate=False)  # first load creates
    assert read_jdbc(spark, url, "t_sink").count() == 100
    # second overwrite truncates and reloads — never appends
    df2 = spark.range(10).withColumn("v", F.col("id"))
    overwrite_jdbc(df2, url, "t_sink", truncate=True)
    got = read_jdbc(spark, url, "t_sink")
    assert got.count() == 10
    assert {r.id for r in got.collect()} == set(range(10))
