"""Battery 3: null-safe join equality, explode/unnest, ordered string
aggregation, boolean aggregates, distinct aggregation — the last
commonly-used relational idioms not yet in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def nullsafe_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): match customers on a nullable derived
    key where NULL must equal NULL (plain = would drop those rows)."""
    c = load_table(spark, sf_dir, "customer")
    # nullable key: segment initial for positive balances, else NULL
    keyed = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") >= 0, F.substring("c_mktsegment", 1, 1)).alias("k"),
    )
    a = keyed.select(F.col("c_custkey").alias("id_a"), F.col("k").alias("k_a"))
    b = keyed.select(F.col("c_custkey").alias("id_b"), F.col("k").alias("k_b"))
    return (
        a.join(b, F.col("k_a").eqNullSafe(F.col("k_b")))
        .groupBy("k_a")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumnRenamed("k_a", "k")
    )


NULLSAFE_JOIN_SQL = """
WITH keyed AS (
  SELECT c_custkey,
    CASE WHEN c_acctbal >= 0 THEN substring(c_mktsegment, 1, 1) END AS k
  FROM customer
)
SELECT a.k AS k, COUNT(*) AS n_pairs
FROM keyed a JOIN keyed b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
"""


def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest: flatten tokens and count global frequencies — the
    lateral-view word-count classic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


EXPLODE_SQL = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


def string_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: per nation, the sorted distinct set of
    market segments joined with '|' (deterministic listagg)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.array_sort(F.collect_set("c_mktsegment")), "|"
        ).alias("segments")
    )


STRING_AGG_SQL = """
SELECT c_nationkey,
  string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
FROM customer GROUP BY c_nationkey
"""


def bool_agg_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates + count_if + sum-distinct per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    high_qty = F.col("l_quantity") > 45
    return li.groupBy("l_returnflag").agg(
        F.bool_or(high_qty).alias("any_high_qty"),
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.count_if(F.col("l_tax") == 0.0).alias("n_tax_free"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(20,8)"))
        .cast("double")
        .alias("sum_distinct_qty"),
    )


BOOL_AGG_SQL = """
SELECT l_returnflag,
  bool_or(l_quantity > 45) AS any_high_qty,
  bool_and(l_discount <= 0.1) AS all_low_disc,
  count_if(l_tax = 0.0)::BIGINT AS n_tax_free,
  CAST(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
    AS sum_distinct_qty
FROM lineitem GROUP BY l_returnflag
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("nullsafe_join_segments", nullsafe_join_segments, NULLSAFE_JOIN_SQL)
    register("explode_token_counts", explode_token_counts, EXPLODE_SQL)
    register("string_agg_segments", string_agg_segments, STRING_AGG_SQL)
    register("bool_agg_flags", bool_agg_flags, BOOL_AGG_SQL)
