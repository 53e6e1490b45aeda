"""Window analytics (first/last/nth value), map functions, and
multi-aggregate pivot — remaining §2.8/§2.4/§2.3 surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.registry import load_table


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value/rank/dense_rank/ntile over each
    customer's order history (frame = whole partition for the value
    functions, running for rank)."""
    o = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    full_w = order_w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_totalprice").over(full_w).alias("first_price"),
        F.last_value("o_totalprice").over(full_w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full_w).alias("second_price"),
        F.rank().over(order_w).alias("rnk"),
        F.dense_rank().over(order_w).alias("drnk"),
        F.ntile(4).over(order_w).alias("quartile"),
    )


WINDOW_ANALYTICS_SQL = """
SELECT o_custkey, o_orderkey,
  FIRST_VALUE(o_totalprice) OVER w_full AS first_price,
  LAST_VALUE(o_totalprice) OVER w_full AS last_price,
  NTH_VALUE(o_totalprice, 2) OVER w_full AS second_price,
  (RANK() OVER w_ord)::INT AS rnk,
  (DENSE_RANK() OVER w_ord)::INT AS drnk,
  (NTILE(4) OVER w_ord)::INT AS quartile
FROM orders
WINDOW
  w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
  w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def map_cols() -> list:
    """Map battery projection over ``events`` (reused by the merged
    event_funcs_battery entry)."""
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return [
        m.getItem("type").alias("type_via_map"),
        # joined string (literal key order — stable); raw arrays crash
        # the gate canonicalizer
        F.array_join(F.map_keys(m), ",").alias("keys_sorted"),
        F.size(m).alias("n_keys"),
    ]


def map_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access: build a map from JSON props, read
    through it, enumerate keys. Maps are compared via sorted entry
    strings (engine map ordering differs)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", *map_cols())


MAP_FUNCS_SQL = """
SELECT event_id,
  MAP(['type','uid'], [event_type, user_id::VARCHAR])['type'][1] AS type_via_map,
  'type,uid' AS keys_sorted,
  2::INT AS n_keys
FROM events
"""


def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivot value (sum + count per
    linestatus) — column naming follows Spark's `{value}_{alias}`
    convention, reproduced explicitly in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            dsum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


PIVOT_MULTI_AGG_SQL = """
SELECT l_returnflag,
  CAST(CAST(SUM(CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(20,8)) END) AS VARCHAR) AS DOUBLE) AS F_qty,
  COUNT(*) FILTER (l_linestatus='F') AS F_cnt,
  CAST(CAST(SUM(CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(20,8)) END) AS VARCHAR) AS DOUBLE) AS O_qty,
  COUNT(*) FILTER (l_linestatus='O') AS O_cnt
FROM lineitem GROUP BY l_returnflag
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics (operators/merge.py): an updates batch (every 7th
    order repriced, plus brand-new keys) upserted into orders."""
    from ..operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    # ×2 is exact in IEEE (exponent bump) — a ×1.1-then-round reprice hits
    # half-way rounding ties where engines disagree
    repriced = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    new_rows = o.filter(F.col("o_orderkey") % 1000 == 3).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000_000
    )
    updates = repriced.unionByName(new_rows)
    merged = merge_upsert(o, updates, ["o_orderkey"])
    return merged.select("o_orderkey", "o_custkey", "o_totalprice")


def incremental_matview_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-customer
    (n_orders, total_spend) view updated from a CDC changelog WITHOUT
    re-reading changed base rows — the warehouse pattern behind
    incremental materialized views / Delta Live aggregates.

    Changelog (same deterministic convention as ``merge_upsert_orders``):
    every 7th order repriced ×2 (UPDATE), every 1000th+3 inserted under
    a new key (INSERT), every 11th+5 not-updated order removed (DELETE).
    Each change row contributes a SIGNED delta — update: (0, new−old);
    insert: (+1, +price); delete: (−1, −price) — aggregated per
    customer and union-merged with the base view; groups whose count
    reaches 0 drop out. Spend deltas ride through exact decimals, so
    applying deltas in any shuffle order lands bit-identically on the
    oracle's FULL RECOMPUTE of the view from the post-change table —
    the equivalence that makes incremental maintenance trustworthy.

    At 100 TB the base view is O(|customers|) and the delta pass reads
    ONLY the changelog: no fact rescan, one union + re-aggregation on
    the view's own grouping key.
    """
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    price = F.col("o_totalprice").cast("decimal(12,2)")

    base_view = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum(price).alias("spend")
    )
    updates = o.filter(key % 7 == 0).select(
        "o_custkey",
        F.lit(0).cast("long").alias("dn"),
        ((F.col("o_totalprice") * 2).cast("decimal(12,2)") - price).alias(
            "dspend"
        ),
    )
    inserts = o.filter(key % 1000 == 3).select(
        "o_custkey", F.lit(1).cast("long").alias("dn"), price.alias("dspend")
    )
    deletes = o.filter((key % 7 != 0) & (key % 11 == 5)).select(
        "o_custkey", F.lit(-1).cast("long").alias("dn"), (-price).alias("dspend")
    )
    delta = (
        updates.unionByName(inserts)
        .unionByName(deletes)
        .groupBy("o_custkey")
        .agg(F.sum("dn").alias("n"), F.sum("dspend").alias("spend"))
    )
    return (
        base_view.unionByName(delta)
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("spend").alias("spend_dec"))
        .filter(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            "n_orders",
            F.col("spend_dec").cast("double").alias("total_spend"),
        )
    )


INCREMENTAL_MATVIEW_SQL = """
WITH final_t AS (
  SELECT o_custkey, CAST(o_totalprice * 2 AS DECIMAL(12,2)) AS p
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
  FROM orders WHERE o_orderkey % 1000 = 3
  UNION ALL
  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2))
  FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 5
)
SELECT o_custkey, COUNT(*)::BIGINT AS n_orders,
       CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS total_spend
FROM final_t GROUP BY 1
"""


MERGE_UPSERT_SQL = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 1000 = 3
)
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice FROM updates
"""


def per_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer OLS spend trend — exact
    integer-domain arithmetic makes even the Python grouped-map path
    hash-verifiable against the SQL twin (operators/grouped.py)."""
    from ..operators.grouped import per_group_trend_ols

    o = load_table(spark, sf_dir, "orders")
    return per_group_trend_ols(o)


PER_GROUP_TREND_SQL = """
WITH pts AS (
  SELECT o_custkey,
    floor(epoch(o_orderdate))::BIGINT AS e,
    (CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT AS yc
  FROM orders
), xs AS (
  SELECT o_custkey, (e - MIN(e) OVER (PARTITION BY o_custkey)) // 86400 AS x, yc
  FROM pts
), s AS (
  SELECT o_custkey, COUNT(*) AS n, SUM(x)::BIGINT AS sx,
    SUM(x*x)::BIGINT AS sxx, SUM(yc)::BIGINT AS syc, SUM(x*yc)::BIGINT AS sxyc
  FROM xs GROUP BY o_custkey
)
SELECT o_custkey, n,
  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
       ELSE ((n*sxyc - sx*syc)::DOUBLE / 100.0) / (n*sxx - sx*sx)::DOUBLE
  END AS slope,
  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
       ELSE (syc::DOUBLE / 100.0
             - (((n*sxyc - sx*syc)::DOUBLE / 100.0) / (n*sxx - sx*sx)::DOUBLE)
               * sx::DOUBLE) / n::DOUBLE
  END AS intercept
FROM s
"""


def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: per-user hourly buckets over each user's
    own [min, max] span with gap rows injected (n=0) and the last
    observed hourly sum forward-filled — the standard
    densify-then-carry-forward prepass for downstream diffing/charting.

    Scale shape: one agg shuffle to hourly buckets, a per-user span agg
    (tiny), a sequence-explode grid (narrow — at most span-hours rows
    per user), a co-partitioned left join, and ONE ordered window per
    user for the fill. No driver-side loops, no cross joins; the grid is
    bounded by time-span × users, not events."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    w = Window.partitionBy("user_id").orderBy("h")
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.col("sum_value").isNull().alias("is_gap"),
            F.round(F.last("sum_value", ignorenulls=True).over(w), 6).alias(
                "filled_sum"
            ),
        )
    )


RESAMPLE_FFILL_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n,
    CAST(CAST(SUM(CAST(value AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
      AS sum_value
  FROM events WHERE user_id < 50 GROUP BY user_id, date_trunc('hour', ts)
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id)
)
SELECT g.user_id, g.h,
  COALESCE(hourly.n, 0) AS n,
  hourly.sum_value IS NULL AS is_gap,
  ROUND(LAST_VALUE(hourly.sum_value IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_sum
FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h
"""


def pagerank_orders_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over a deterministic 100-node graph derived
    from orders (src = custkey mod 100 → dst = orderkey mod 100) —
    the graph is synthetic scaffolding; the operator under test is the
    generic iterative engine (operators/components.py::pagerank), whose
    per-iteration decimal-summed contributions let the unrolled-CTE
    DuckDB twin match bit-for-bit."""
    from ..operators.components import pagerank

    o = load_table(spark, sf_dir, "orders")
    edges = o.select(
        F.pmod("o_custkey", F.lit(100)).alias("src"),
        F.pmod("o_orderkey", F.lit(100)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    out = pagerank(edges, iterations=3, damping=0.85, checkpoint_every=None)
    return out.select("node", F.round("rank", 6).alias("rank"))


def _pagerank_oracle_sql(iterations: int = 3) -> str:
    parts = [
        """WITH e AS (
  SELECT DISTINCT o_custkey % 100 AS src, o_orderkey % 100 AS dst
  FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(f"""c{i} AS (
  SELECT e.dst AS node,
    CAST(CAST(SUM(CAST(r{i-1}.rank / outdeg.outdeg AS DECIMAL(20,8)))
         AS VARCHAR) AS DOUBLE) AS s
  FROM e JOIN r{i-1} ON r{i-1}.node = e.src
  JOIN outdeg ON outdeg.src = e.src
  GROUP BY e.dst
), r{i} AS (
  SELECT nodes.node,
    (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c{i}.s, 0.0) AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON c{i}.node = nodes.node
)""")
    return (
        ",\n".join(parts)
        + f"\nSELECT node, ROUND(rank, 6) AS rank FROM r{iterations}"
    )


def register_entries(register) -> None:  # noqa: ANN001
    register("merge_upsert_orders", merge_upsert_orders, MERGE_UPSERT_SQL)
    register(
        "incremental_matview_orders",
        incremental_matview_orders,
        INCREMENTAL_MATVIEW_SQL,
    )
    register("per_group_trend", per_group_trend, PER_GROUP_TREND_SQL)
    register("window_analytics", window_analytics, WINDOW_ANALYTICS_SQL)
    register("resample_ffill_hourly", resample_ffill_hourly, RESAMPLE_FFILL_SQL)
    register("pagerank_orders_graph", pagerank_orders_graph, _pagerank_oracle_sql())
    register("map_funcs_battery", map_funcs_battery, MAP_FUNCS_SQL)
    register("pivot_multi_agg", pivot_multi_agg, PIVOT_MULTI_AGG_SQL)
    register(
        "window_cumulative_distinct",
        window_cumulative_distinct,
        WINDOW_CUM_DISTINCT_SQL,
    )


def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day. Spark has no
    COUNT(DISTINCT) OVER — the canonical idiom is ``size(collect_set()
    OVER (RANGE UNBOUNDED PRECEDING))``, which is order-independent
    (set semantics) and therefore deterministic; rows collapse back to
    one per (type, day). The oracle avoids window-DISTINCT too and
    checks via a day-triangle join."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "user_id",
    ).distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date("day"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.withColumn("cum", F.size(F.collect_set("user_id").over(w)))
    return cum.groupBy("event_type", "day").agg(
        F.max("cum").cast("long").alias("cum_users")
    )


WINDOW_CUM_DISTINCT_SQL = """
WITH d AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
  FROM events
), days AS (SELECT DISTINCT event_type, day FROM d)
SELECT days.event_type, days.day AS day,
  COUNT(DISTINCT d.user_id)::BIGINT AS cum_users
FROM days JOIN d ON d.event_type = days.event_type AND d.day <= days.day
GROUP BY days.event_type, days.day
"""
