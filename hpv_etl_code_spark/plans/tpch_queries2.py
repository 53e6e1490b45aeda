"""TPC-H-shaped relational coverage, part 2 (Q4/Q7/Q13/Q16/Q19/Q22
analogs adapted to the synthetic corpus's columns — no partsupp /
shipmode / commitdate in the test tables, so each keeps the *query
shape* that matters and swaps in available predicates).

These exist to demonstrate the remaining classic relational idioms the
part-1 module doesn't cover: correlated EXISTS (semi join), self-aliased
dimension pairs, left-outer double aggregation, NOT IN (anti join) under
COUNT DISTINCT, disjunctive predicate pushdown, and a scalar-subquery
threshold feeding an anti join. All aggregates go through the
deterministic decimal presentation (functions/numeric.py) so every entry
is hash-checkable against its DuckDB oracle.

Reference scope note: the reference pipeline (src/main.py:17-120) has no
multi-table analytics at all — this module is part of the engine's
general-query surface beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.registry import load_table


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — correlated EXISTS compiled to a LEFT SEMI join.

    Orders from 1997Q1 that have at least one returned line shipped
    after the order date, counted by priority. The semi join keeps the
    orders side's cardinality (no fan-out from multi-line matches), and
    the returnflag filter is pushed into the lineitem scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_returnflag = 'R'
      AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — the same dimension joined twice under different roles.

    Revenue flowing between NATION_1 and NATION_2 (either direction) by
    (supplier nation, customer nation, ship year). Both nation sides and
    the supplier table broadcast; the only shuffles are the two fact
    joins and the final aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, ship_year,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS ship_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — left outer join preserved through two aggregations.

    How many customers placed exactly N non-urgent orders, including
    N = 0 (the left join keeps order-less customers; COUNT of the join
    key counts zero for them). Two shuffles: per-customer count, then
    the histogram over counts.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — NOT IN compiled to a LEFT ANTI join under a
    COUNT(DISTINCT) rollup.

    Distinct suppliers who shipped each (brand, size) of non-PROMO
    parts, excluding suppliers in deficit (the NOT IN subquery). The
    deficit-supplier set is a handful of keys — broadcast anti join, no
    extra shuffle. COUNT DISTINCT expands to the standard two-phase
    plan (partial distinct then merge).
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_brand") != "Brand#5")
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_key"))
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("bad_key"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_size").asc(),
        )
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_brand <> 'Brand#5'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — OR-of-ANDs predicate across a join.

    Revenue from three disjoint brand/size/quantity bands. The
    brand+size legs reference only part columns and the quantity legs
    only lineitem columns, so Catalyst factors a partial filter to EACH
    scan (p_size <= 15 ∨-free residue on part, l_quantity <= 36 on
    lineitem) before the broadcast join evaluates the full disjunction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 36)
        )
    )
    return j.filter(band).agg(
        dsum(_revenue()).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


Q19_SQL = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 36)
"""


def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — scalar-subquery threshold feeding an anti join.

    Customers with above-average positive balances and no order since
    2000 (the corpus runs 1995-2001; a lifetime NOT EXISTS matches
    almost nobody in this dense fixture), rolled up by nation. The
    threshold is computed once with the deterministic decimal-sum/count
    division (identical on both engines — a plain double AVG is
    order-dependent and could flip a customer sitting on the boundary),
    broadcast as a scalar via crossJoin, and the order check is a
    LEFT ANTI on c_custkey.
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("q4_priority_with_returns", q4_priority_with_returns, Q4_SQL)
    register("q7_nation_volume", q7_nation_volume, Q7_SQL)
    register("q13_order_count_distribution", q13_order_count_distribution, Q13_SQL)
    register("q16_supplier_diversity", q16_supplier_diversity, Q16_SQL)
    register("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL)
    register("q22_dormant_accounts", q22_dormant_accounts, Q22_SQL)
