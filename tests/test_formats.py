"""File-format surface beyond parquet/CSV/xlsx: ORC and JSON-lines
round-trip losslessly through the truncate-and-load sinks, and the ORC
scan keeps the same pushdown/pruning properties as parquet (it's a
first-class columnar format in Spark, not a second tier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.sources.registry import load_table
from hpv_etl_code_spark.sources.sinks import (
    overwrite_jsonl,
    overwrite_orc,
    read_jsonl,
)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "lineitem_orc")
    n = overwrite_orc(li, path)
    back = spark.read.orc(path)
    assert n == li.count()
    assert back.schema == li.schema
    assert _sorted_rows(back) == _sorted_rows(li)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "lineitem_orc2")
    overwrite_orc(li, path)
    q = (
        spark.read.orc(path)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_quantity")
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan
    import re

    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert {c.split(":")[0] for c in schema.split(",")} == {
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
    }


def test_orc_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_orc_by_year")
    overwrite_orc(o, path, partition_by=["o_year"])
    q = spark.read.orc(path).filter(F.col("o_year") == 1995)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan
    assert q.count() == o.filter(F.col("o_year") == 1995).count()


def test_jsonl_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    n = overwrite_jsonl(d, path)
    assert n == d.count()
    back = read_jsonl(
        spark, path, schema="doc_id long, text string, lang string, source string, n_chars long"
    ).select(*d.columns)
    assert back.schema == d.schema
    assert _sorted_rows(back) == _sorted_rows(d)


def test_compact_parquet_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    """20 tiny files → 1 compacted file, bit-identical data."""
    from hpv_etl_code_spark.sources.sinks import compact_parquet
    from hpv_etl_code_spark.sources.registry import load_table

    target = str(tmp_path / "smallfiles")
    nat = load_table(spark, sf_dir, "nation")
    nat.repartition(20).write.parquet(target)

    before_rows = sorted(map(tuple, spark.read.parquet(target).collect()))
    files_before, files_after = compact_parquet(
        spark, target, target_file_bytes=1 << 30
    )
    assert files_before == 20
    assert files_after == 1
    after_rows = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert after_rows == before_rows


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A table whose files drifted (columns added over time) must read
    with the unified schema under mergeSchema, old files NULL-filling
    the new column — the storage-level twin of combine_files'
    unionByName(allowMissingColumns=True)."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id LONG, v STRING"
    ).write.parquet(base + "/batch=0")
    spark.createDataFrame(
        [(2, "b", 3.5)], "id LONG, v STRING, score DOUBLE"
    ).write.parquet(base + "/batch=1")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert {f.name for f in df.schema} == {"id", "v", "score", "batch"}
    rows = {r["id"]: (r["v"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 3.5)}
