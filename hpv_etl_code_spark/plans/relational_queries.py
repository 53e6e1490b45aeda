"""M3 catalog entries: the full relational surface (SURVEY §2.6-§2.8 +
§2.4 extension functions) — joins, windows, set ops, sort/limit,
JSON/date/string functions, as-of join.

Scale notes per entry are in each docstring; the common themes:
- dimension joins are explicitly ``broadcast()`` (no shuffle of the fact),
- fact-fact joins shuffle once on the join key and AQE handles skew,
- window queries shuffle once on the partition key,
- every aggregate is decimal-exact so results are order-independent.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..operators.asof import asof_join_backward
from ..sources.registry import load_table

# serializes the scoped spark.sql.cteRecursionRowLimit override in
# recursive_ancestor_depth (VERDICT r5 #8) — see its docstring
_CTE_CONF_LOCK = threading.Lock()


# ---------------------------------------------------------------- joins

def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region with broadcast dims: the fact table
    never shuffles — both dimension sides ship to every executor."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, COUNT(*) AS n_customers,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem: both sides large → one shuffle on l_orderkey
    (sort-merge or AQE-chosen); revenue rollup by priority."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


JOIN_FACT_FACT_SQL = """
SELECT o_orderpriority,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer with its order count (0 for none)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having at least one order — no right columns,
    no duplicate multiplication, early-out probe."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders since 2000 (the filter keeps
    the result non-empty at every scale factor, and Catalyst pushes it
    below the join into the orders scan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
"""


# -------------------------------------------------------------- windows

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer: one shuffle on the partition
    key; deterministic tiebreak on o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC)::INT AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-to-order price delta via lag()."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - prev, 2).alias("price_delta"),
    )


WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey,
  ROUND(o_totalprice - LAG(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), 2)
    AS price_delta
FROM orders
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (decimal-exact running sum)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col("o_totalprice").cast("decimal(20,8)")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        run.cast("double").alias("cum_spend"),
    )


WINDOW_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
    AS cum_spend
FROM orders
"""


# -------------------------------------------------------------- set ops

def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of nation keys referenced by customers/suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


SETOP_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nation keys having BOTH customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


SETOP_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): customers all of whose orders
    are still open-less — i.e. custkeys with orders minus custkeys with
    an 'O'-status order. Non-empty at every scale factor."""
    o = load_table(spark, sf_dir, "orders")
    all_cust = o.select(F.col("o_custkey").alias("custkey"))
    open_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.subtract(open_cust)


SETOP_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


# ------------------------------------------------------- sort/limit/misc

def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price: Spark's orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k then a tiny driver merge,
    never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props → typed column via from_json with an explicit schema
    (never schema-inferred per row)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select("event_id", parsed.getField("k").alias("k"))


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


def date_trunc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup (date_trunc + decimal-exact sum)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


DATE_TRUNC_SQL = """
SELECT date_trunc('month', o_orderdate) AS order_month,
  COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
"""


def string_cols() -> list:
    """String battery projection over ``part`` (reused by the merged
    part_funcs_battery entry)."""
    return [
        F.initcap(F.trim(F.col("p_type"))).alias("type_title"),
        F.nullif(F.regexp_extract("p_name", r"(\d+)", 1), F.lit("")).alias(
            "first_digits"
        ),
        F.element_at(F.split(F.col("p_type"), " "), -1).alias("type_last_word"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.lower(F.col("p_type")).contains("steel"), F.lit("metal"))
        .otherwise(F.lit("other"))
        .alias("material_class"),
    ]


def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery (F1-F7 analogs): trim/initcap-equivalent,
    regexp_extract, split, substring, concat, length, case mapping."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", *string_cols())


STRING_FUNCS_SQL = """
SELECT p_partkey,
  array_to_string(list_transform(string_split(trim(p_type), ' '),
                  w -> upper(w[1:1]) || lower(w[2:])), ' ') AS type_title,
  NULLIF(regexp_extract(p_name, '(\\d+)', 1), '') AS first_digits,
  string_split(p_type, ' ')[-1] AS type_last_word,
  length(p_name)::INT AS name_len,
  concat_ws('|', p_brand, p_type) AS brand_type,
  CASE WHEN contains(lower(p_type), 'steel') THEN 'metal' ELSE 'other' END
    AS material_class
FROM part
"""


def asof_join_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event attached to the user's most recent signup
    at-or-before it (operators/asof.py — one shuffle, no range blow-up)."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return asof_join_backward(
        ev,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["ts"],
    ).select("event_id", "user_id", "ts", F.col("ts_asof").alias("signup_ts"))


ASOF_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
"""


def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: customers above the global average balance.
    The average is computed once (broadcast scalar), decimal-exact so the
    threshold comparison is engine-identical."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.agg(
        (F.sum(F.col("c_acctbal").cast("decimal(20,8)")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_acctbal")
    )


SCALAR_SUBQUERY_SQL = """
SELECT c_custkey, c_acctbal FROM customer
WHERE c_acctbal > (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / COUNT(*)
  FROM customer)
"""


def in_subquery_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery shape (compiles to left-semi): customers holding at
    least one top-decile-priced order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


IN_SUBQUERY_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event's NEXT purchase by the same user (the
    conversion-attribution shape)."""
    from ..operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    return asof_join_forward(
        ev, purchases, on=["user_id"], left_ts="ts", right_ts="ts", payload=["ts"]
    ).select("event_id", "user_id", "ts", F.col("ts_asof").alias("next_purchase_ts"))


ASOF_FORWARD_SQL = """
SELECT e.event_id, e.user_id, e.ts, p.ts AS next_purchase_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts <= p.ts
"""


def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: each order's trailing-7-day spend per
    customer — rangeBetween on epoch seconds (value-based frame, not
    row-count), the core trailing-metric idiom."""
    o = load_table(spark, sf_dir, "orders")
    epoch = F.unix_timestamp(F.col("o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-7 * 86400, 0)
    )
    run = F.sum(F.col("o_totalprice").cast("decimal(20,8)")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        run.cast("double").alias("trailing_7d_spend"),
    )


WINDOW_TRAILING_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) OVER (
    PARTITION BY o_custkey ORDER BY floor(epoch(o_orderdate))::BIGINT
    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
    AS trailing_7d_spend
FROM orders
"""


def json_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VARIANT: parse once, extract
    typed fields lazily — the shredding-friendly path for heterogeneous
    JSON at scale (vs from_json's rigid upfront schema)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
    )


JSON_VARIANT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — each
    high-balance customer's 3 most recent orders. Catalyst DECORRELATES
    the per-row subquery into a per-key row_number window + ONE join
    (no per-customer re-execution; the plan is the same shape as the
    hand-written window top-k) — the optimizer surface this entry pins.
    DuckDB runs the identical LATERAL SQL natively as the oracle."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(LATERAL_TOPK_SQL)


LATERAL_TOPK_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_orderdate FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_orderdate DESC, o_orderkey LIMIT 3
) o
WHERE c.c_acctbal > 9000
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("lateral_topk_orders", lateral_topk_orders, LATERAL_TOPK_SQL)
    register("scalar_subquery_above_avg", scalar_subquery_above_avg, SCALAR_SUBQUERY_SQL)
    register("in_subquery_big_spenders", in_subquery_big_spenders, IN_SUBQUERY_SQL)
    register("asof_join_next_purchase", asof_join_next_purchase, ASOF_FORWARD_SQL)
    register("window_trailing_range", window_trailing_range, WINDOW_TRAILING_RANGE_SQL)
    register("join_broadcast_dims", join_broadcast_dims, JOIN_BROADCAST_SQL, headline=True)
    register("join_fact_fact", join_fact_fact, JOIN_FACT_FACT_SQL, headline=True)
    register("join_left_outer", join_left_outer, JOIN_LEFT_OUTER_SQL)
    register("join_semi", join_semi, JOIN_SEMI_SQL)
    register("join_anti", join_anti, JOIN_ANTI_SQL)
    register("window_topk_per_group", window_topk_per_group, WINDOW_TOPK_SQL, headline=True)
    register("window_lag_delta", window_lag_delta, WINDOW_LAG_SQL)
    register("window_running_sum", window_running_sum, WINDOW_RUNNING_SUM_SQL)
    register("setop_union_distinct", setop_union_distinct, SETOP_UNION_SQL)
    register("setop_intersect", setop_intersect, SETOP_INTERSECT_SQL)
    register("setop_except", setop_except, SETOP_EXCEPT_SQL)
    register("sort_limit_top_orders", sort_limit_top_orders, SORT_LIMIT_SQL)
    register("json_extract_events", json_extract_events, JSON_EXTRACT_SQL)
    register("json_variant_events", json_variant_events, JSON_VARIANT_SQL)
    register("date_trunc_orders", date_trunc_orders, DATE_TRUNC_SQL)
    register("string_funcs_part", string_funcs_part, STRING_FUNCS_SQL)
    register("asof_join_signup", asof_join_signup, ASOF_JOIN_SQL, headline=True)
    register(
        "recursive_ancestor_depth", recursive_ancestor_depth, RECURSIVE_ANCESTOR_SQL
    )
    register("variant_extract_events", variant_extract_events, VARIANT_EXTRACT_SQL)


def recursive_ancestor_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE — iterative UNION ALL
    expansion planned by Catalyst): every customer key walks its
    synthetic parent chain key -> key/2 down to root 1; output is the
    depth histogram. Integer-exact, so DuckDB's recursive CTE must
    reproduce it bit-for-bit — the hierarchy/transitive-closure surface
    (org charts, BOM explosion, graph reachability) that previously
    needed driver-side iteration.

    The cumulative-row guard (``spark.sql.cteRecursionRowLimit``,
    default 1M) is sized to THIS query's known recursion volume: the
    chain key → key/2 emits one row per node per level, so the exact
    working set is n·(log2(max key)+1) — 2.6M rows at sf1's 150k
    customers, which tripped the default guard in the full-catalog sf1
    sweep. The bound is computed from the actual row count with 2×
    headroom rather than set to a huge constant, so the guard stays
    proportional to real data and a genuinely runaway recursion still
    trips it. Because the knob is session-wide (Spark has no per-query
    limit), the override is SCOPED: the recursion executes inside this
    call — one stats job (count+max fused), raise guard, run, restore
    the prior value in a ``finally`` — and the tiny depth histogram
    (≤ log2(max key)+1 rows) is returned as a local DataFrame, so no
    raised guard or conf mutation leaks into later queries on the
    shared session."""
    import math

    from ..sources.registry import register_views

    register_views(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    stats = c.agg(
        F.count(F.lit(1)).alias("n"), F.max("c_custkey").alias("mk")
    ).collect()[0]
    n, max_key = stats["n"], stats["mk"] or 1
    bound = max(1_000_000, 2 * n * (int(math.log2(max(max_key, 2))) + 2))
    conf_key = "spark.sql.cteRecursionRowLimit"
    # VERDICT r5 #8: the knob is SESSION-GLOBAL, so the set→run→restore
    # window is serialized under a process-local lock — a concurrent
    # catalog query on the shared session can neither observe the
    # raised guard nor clobber the restore (tests/test_relational.py::
    # test_recursive_cte_conf_guard_is_locked). Cross-process sharing
    # of one Spark session isn't a supported deployment shape.
    with _CTE_CONF_LOCK:
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, bound)
        try:
            rows = spark.sql(
                """
                WITH RECURSIVE anc(node, a, d) AS (
                  SELECT c_custkey, c_custkey, 0 FROM customer
                  UNION ALL
                  SELECT node, a DIV 2, d + 1 FROM anc WHERE a > 1
                )
                SELECT depth, COUNT(*) AS n_nodes
                FROM (SELECT node, MAX(d) AS depth FROM anc GROUP BY node)
                GROUP BY depth
                """
            ).collect()
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
    return spark.createDataFrame(rows, schema="depth INT, n_nodes BIGINT")


RECURSIVE_ANCESTOR_SQL = """
WITH RECURSIVE anc(node, a, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT node, a // 2, d + 1 FROM anc WHERE a > 1
)
SELECT depth, COUNT(*)::BIGINT AS n_nodes
FROM (SELECT node, MAX(d) AS depth FROM anc GROUP BY node)
GROUP BY depth
"""


def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` shreds the JSON string to
    the binary VARIANT encoding once; ``variant_get`` then extracts
    typed fields WITHOUT re-parsing text per access — the semi-
    structured scale path (the classic get_json_object re-parses the
    string on every extraction). Aggregates the extracted int per event
    type; integer-exact, DuckDB reproduces it via json_extract."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


VARIANT_EXTRACT_SQL = """
SELECT event_type,
  COUNT(json_extract(props, '$.k')) AS n_with_k,
  SUM(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
  MIN(json_extract(props, '$.k')::INT)::INT AS min_k,
  MAX(json_extract(props, '$.k')::INT)::INT AS max_k
FROM events GROUP BY event_type
"""
