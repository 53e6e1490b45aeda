"""TPC-H-shaped multi-join analytics on the test corpus (Q3/Q5 analogs;
Q1 is plans/flagship.py). These are the headline join-heavy benchmarks:
dimension sides broadcast, fact-fact joins shuffle once, aggregates are
decimal-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.registry import load_table

def _revenue():
    # built lazily — Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 analog: top-10 BUILDING-segment orders by open revenue.

    Filters reach the scans (PushedFilters); the two fact joins shuffle
    on o_orderkey; the top-10 compiles to TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 analog: revenue by nation for ASIA where supplier and customer
    share a nation. Five-table join; region/nation/supplier broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL frontend surface: the same labeled-rollup semantics through
    ``spark.sql`` over registered views — proving the engine speaks both
    DataFrame and ANSI SQL (GROUPING SETS parsed by Spark's parser)."""
    from ..sources.registry import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
          CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
               ELSE o_orderpriority END AS priority,
          CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
               ELSE o_orderstatus END AS status,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) AS DOUBLE)
            AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """
    )


SQL_GROUPING_SETS_SQL = """
SELECT
  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
       ELSE o_orderpriority END AS priority,
  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
  COUNT(*) AS n,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus), ())
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 analog: pure filter + aggregate — every predicate lands in
    PushedFilters; the scan prunes to 4 columns; no shuffle at all
    beyond the final single-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def salted_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation salted join (operators/skew.py), oracle-checked
    against plain join semantics: customer segment revenue via orders,
    with orders scattered across 8 salt partitions."""
    from ..operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    return (
        salted_join(o, c, "o_custkey", num_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


SALTED_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 analog: top-20 customers by revenue lost to returned items
    (l_returnflag = 'R'). customer⋈orders⋈lineitem with the return
    filter pushed into the lineitem scan; broadcast of nation-free dims
    is unnecessary — both joins key on the fact side and shuffle once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 analog: share of one month's revenue from 'steel'-type parts.
    lineitem⋈part with the part side BROADCAST (dimension), date filter
    pushed to the lineitem scan, one global aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(
        F.lower(F.col("p_type")).contains("steel"), _revenue()
    ).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (100.0 * dsum(promo) / dsum(_revenue())).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT 100.0 *
  CAST(CAST(SUM(CAST(CASE WHEN contains(lower(p_type), 'steel')
      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
  / CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 analog: customers holding orders whose total quantity exceeds
    300 — the HAVING-subquery shape: aggregate lineitem first (one
    shuffle), filter the aggregate, then join the small survivor set
    back to orders and customer (broadcast the survivors)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 300
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, headline=True)
    register("salted_fact_join", salted_fact_join, SALTED_JOIN_SQL)
    register("q3_shipping_priority", q3_shipping_priority, Q3_SQL, headline=True)
    register("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL, headline=True)
    register("sql_grouping_sets", sql_grouping_sets, SQL_GROUPING_SETS_SQL)
    register("q10_returned_items", q10_returned_items, Q10_SQL, headline=True)
    register("q14_promo_revenue", q14_promo_revenue, Q14_SQL)
    register("q18_large_volume_customers", q18_large_volume_customers, Q18_SQL)
