"""Data-pipeline utility operators: CDC latest-per-key compaction,
deterministic sampling, histogram binning, and table profiling — the
everyday tools of a large-scale ingest pipeline, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: the most recent event per (user, type) — the
    latest-record-wins dedup every changelog ingest needs. One shuffle,
    WindowGroupLimit-pruned."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


LATEST_PER_KEY_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~5% sample via key mod — unlike rand()-based
    sampling this is stable across retries, speculative tasks, and
    engines (the property that makes sampled pipelines debuggable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.pmod(F.col("l_orderkey") * 2654435761 + F.col("l_linenumber"), 100) < 5
    ).select("l_orderkey", "l_linenumber", "l_quantity")


DETERMINISTIC_SAMPLE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE (l_orderkey * 2654435761 + l_linenumber) % 100 < 5
"""


def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order prices via width_bucket — the
    one-shuffle binning idiom behind any distribution dashboard."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12))
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


HISTOGRAM_SQL = """
SELECT CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE floor(o_totalprice / 50000.0)::BIGINT + 1 END AS bucket,
  COUNT(*) AS n
FROM orders GROUP BY 1
"""


def profile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (null count, distinct count, min/max as strings)
    per column — the generic quality-report shape, computed in ONE
    aggregation pass then unpivoted (no per-column jobs)."""
    c = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    aggs = []
    for col in cols:
        aggs += [
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__distinct"),
            F.min(F.col(col).cast("string")).alias(f"{col}__min"),
            F.max(F.col(col).cast("string")).alias(f"{col}__max"),
        ]
    one = c.agg(*aggs)
    profile_rows = [
        F.struct(
            F.lit(col).alias("column_name"),
            F.col(f"{col}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{col}__distinct").alias("n_distinct"),
            F.col(f"{col}__min").alias("min_str"),
            F.col(f"{col}__max").alias("max_str"),
        )
        for col in cols
    ]
    return one.select(F.explode(F.array(*profile_rows)).alias("p")).select("p.*")


PROFILE_SQL = """
SELECT column_name,
  SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
  COUNT(DISTINCT v) AS n_distinct,
  MIN(v) AS min_str,
  MAX(v) AS max_str
FROM (
  SELECT 'c_custkey' AS column_name, c_custkey::VARCHAR AS v FROM customer
  UNION ALL SELECT 'c_name', c_name FROM customer
  UNION ALL SELECT 'c_nationkey', c_nationkey::VARCHAR FROM customer
  UNION ALL SELECT 'c_acctbal', c_acctbal::VARCHAR FROM customer
  UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer
)
GROUP BY column_name
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("latest_per_key", latest_per_key, LATEST_PER_KEY_SQL)
    register("deterministic_sample", deterministic_sample, DETERMINISTIC_SAMPLE_SQL)
    register("histogram_prices", histogram_prices, HISTOGRAM_SQL)
    register("profile_customers", profile_customers, PROFILE_SQL)
