"""Battery 3: null-safe join equality, explode/unnest, ordered string
aggregation, boolean aggregates, distinct aggregation — the last
commonly-used relational idioms not yet in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def nullsafe_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>) as a JOIN KEY: customers carry a
    nullable derived key (segment initial for positive balances, else
    NULL) and join to a key-level dimension where NULL must match NULL
    — plain ``=`` would silently drop every NULL-keyed customer.

    The dimension side is the key-level aggregate itself (≤ 6 rows,
    broadcast), so the null-safe join is hash-based and fact-sized.
    A previous formulation self-joined the fact on this 6-ary key —
    semantically quadratic (~3.7 G joined rows at sf1 before the
    count); redesigned after the sf1 full-catalog sweep flagged it.
    The output proves the NULL row matched: per key, the number of
    fact rows the join retained equals the dimension's member count.
    """
    c = load_table(spark, sf_dir, "customer")
    keyed = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") >= 0, F.substring("c_mktsegment", 1, 1)).alias("k"),
    )
    dim = keyed.groupBy(F.col("k").alias("dk")).agg(
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        keyed.join(F.broadcast(dim), F.col("k").eqNullSafe(F.col("dk")))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_joined"),
            F.max("n_members").cast("long").alias("n_members"),
        )
    )


NULLSAFE_JOIN_SQL = """
WITH keyed AS (
  SELECT c_custkey,
    CASE WHEN c_acctbal >= 0 THEN substring(c_mktsegment, 1, 1) END AS k
  FROM customer
), dim AS (
  SELECT k AS dk, COUNT(*)::BIGINT AS n_members FROM keyed GROUP BY 1
)
SELECT k, COUNT(*)::BIGINT AS n_joined, MAX(n_members)::BIGINT AS n_members
FROM keyed JOIN dim ON k IS NOT DISTINCT FROM dk
GROUP BY k
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
