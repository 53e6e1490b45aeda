"""Operational-planning entries (round 5, session 3): a small-files
compaction planner and a join-key skew report — the two metadata-scale
decisions every 100 TB table maintenance loop makes before touching any
data. Both are pure integer pipelines with exact DuckDB twins; the one
float each emits is a single division rounded to 6dp.

Reference parity note: the reference (src/main.py) has no maintenance
surface; these extend the lakehouse-operations north star alongside
``zonemap_prune_stats`` / ``zorder_layout``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

# First-fit target size for a compacted output file, in (simulated)
# bytes. Real deployments use 128–1024 MiB; the testbed inventory is
# KB-scale, so the target is scaled down to keep the plan non-trivial
# (several buckets) at every sf.
_COMPACT_TARGET = 64 * 1024


def compaction_plan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit compaction plan over the events table's
    (day × event_type) file inventory: files are laid out in a
    deterministic order and packed left-to-right into ~target-size
    output buckets via ``bucket = start_offset DIV target`` — the
    standard planner shape (cumulative sum, no loop, no driver-side
    greedy iteration).

    The testbed has no real small-file listing, so the inventory is
    SIMULATED from the data: one "file" per (event day, event_type)
    with an integer byte estimate (fixed column widths + payload
    lengths). At 100 TB the planner consumes the real file-listing
    metadata instead — millions of rows, not billions — so the single
    cumulative-sum window over the inventory is metadata-scale by
    construction (the same argument as ``zonemap_prune_stats``); the
    data itself is never shuffled by planning.

    Output: one row per planned output bucket — file count, row count,
    total bytes, the packed span, and the fill ratio vs target (the
    single float, one division).
    """
    ev = load_table(spark, sf_dir, "events")
    inv = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.lit(28)
            + F.length("props").cast("bigint")
            + F.length("event_type").cast("bigint")
        )
        .cast("bigint")
        .alias("est_bytes"),
    )
    w = (
        Window.orderBy("day", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = inv.withColumn(
        "start_offset", F.sum("est_bytes").over(w) - F.col("est_bytes")
    ).withColumn(
        "bucket",
        F.expr(f"start_offset DIV {_COMPACT_TARGET}").cast("bigint"),
    )
    return planned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("est_bytes").cast("bigint").alias("total_bytes"),
        F.min("day").cast("string").alias("first_day"),
        F.max("day").cast("string").alias("last_day"),
        F.round(
            F.sum("est_bytes").cast("double") / F.lit(float(_COMPACT_TARGET)),
            6,
        ).alias("fill_ratio"),
    )


COMPACTION_PLAN_SQL = f"""
WITH inv AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         COUNT(*)::BIGINT AS n_rows,
         SUM(28 + length(props) + length(event_type))::BIGINT AS est_bytes
  FROM events GROUP BY 1, 2
), planned AS (
  SELECT day, event_type, n_rows, est_bytes,
         SUM(est_bytes) OVER (ORDER BY day, event_type
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - est_bytes
           AS start_offset
  FROM inv
)
SELECT (start_offset // {_COMPACT_TARGET})::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_files,
       SUM(n_rows)::BIGINT AS n_rows,
       SUM(est_bytes)::BIGINT AS total_bytes,
       MIN(day)::VARCHAR AS first_day,
       MAX(day)::VARCHAR AS last_day,
       ROUND(SUM(est_bytes)::DOUBLE / {float(_COMPACT_TARGET)}, 6)
         AS fill_ratio
FROM planned GROUP BY 1
"""


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew census over the join columns the relational entries
    actually shuffle on — the pre-flight check behind
    ``salted_fact_join``'s salt-count choice. Per join column: row and
    key cardinalities, the heaviest key's share, and the suggested salt
    count ⌈max_key_rows / avg_key_rows⌉ — computed IN INTEGERS as
    (max·n_keys + n_rows − 1) DIV n_rows, so both engines agree exactly;
    the only float is the 6dp heavy-share division.

    Scale: one partial-agg key count per column (the same shuffle the
    join itself would do, minus the payload) and a 1-row summary each;
    nothing is collected. At 100 TB this runs as a sampled sketch
    (CMS/topk — see ``join_size_estimate_cms``); the exact census here
    is the calibration twin.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def census(df: DataFrame, col: str, label: str) -> DataFrame:
        per_key = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        return per_key.agg(
            F.lit(label).alias("join_col"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_key_rows"),
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 6
            ).alias("heavy_share"),
            F.expr(
                "CAST((max(c) * count(*) + sum(c) - 1) DIV sum(c) AS BIGINT)"
            ).alias("suggested_salts"),
        )

    return (
        census(li, "l_orderkey", "lineitem.l_orderkey")
        .unionByName(census(li, "l_partkey", "lineitem.l_partkey"))
        .unionByName(census(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(census(ev, "user_id", "events.user_id"))
    )


JOIN_SKEW_SQL = """
WITH src AS (
  SELECT 'lineitem.l_orderkey' AS join_col, l_orderkey AS k FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
  UNION ALL
  SELECT 'events.user_id', user_id FROM events
), per_key AS (
  SELECT join_col, k, COUNT(*)::BIGINT AS c FROM src GROUP BY 1, 2
)
SELECT join_col,
       SUM(c)::BIGINT AS n_rows,
       COUNT(*)::BIGINT AS n_keys,
       MAX(c)::BIGINT AS max_key_rows,
       ROUND(MAX(c)::DOUBLE / SUM(c)::DOUBLE, 6) AS heavy_share,
       ((MAX(c) * COUNT(*) + SUM(c) - 1) // SUM(c))::BIGINT
         AS suggested_salts
FROM per_key GROUP BY 1
"""


# ------------------------------------------------ Hilbert layout

_HB_ORDER = 16
_HB_MASK = (1 << _HB_ORDER) - 1
# zone-map simulation constants shared with stats_queries.zonemap_*
_HB_ROWS_PER_FILE = 1000
_HB_CK_LO, _HB_CK_HI = 40, 80
_HB_PQ_LO, _HB_PQ_HI = 2000, 6000


def _orders_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").bitwiseAND(F.lit(_HB_MASK)).alias(
            "ck16"
        ),
        F.floor(F.col("o_totalprice") / 32)
        .cast("long")
        .bitwiseAND(F.lit(_HB_MASK))
        .alias("pq16"),
    )


def hilbert_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over (custkey, quantized price) —
    the locality-preserving upgrade of ``zorder_key_orders``: unlike
    Morton's Z-shaped jumps, consecutive Hilbert positions are always
    grid neighbors, so key-range file spans have tighter per-dimension
    bounds (measured next door in ``hilbert_prune_stats``). The entry
    hash-checks the 16-level rotate/reflect recurrence against the
    stacked-CTE SQL twin; bijectivity and the unit-step property are
    pytest-locked on a full grid (tests/test_ops_queries.py)."""
    from ..operators.layout import hilbert_xy2d

    return hilbert_xy2d(
        _orders_quantized(spark, sf_dir), "ck16", "pq16", "hval",
        order=_HB_ORDER,
    ).select("o_orderkey", "hval")


def _hilbert_key_sql() -> str:
    from ..operators.layout import hilbert_xy2d_sql

    inner = hilbert_xy2d_sql(
        "o_orderkey",
        f"o_custkey & {_HB_MASK}",
        f"CAST(floor(o_totalprice / 32) AS BIGINT) & {_HB_MASK}",
        "orders",
        order=_HB_ORDER,
    )
    return inner


def hilbert_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHY Hilbert over Z-order: the same zone-map pruning simulation
    as ``zonemap_prune_stats`` (simulated per-file min/max stats, same
    rectangle predicate, same file size), run under BOTH
    multi-dimensional layouts. Hilbert's unit-step locality keeps every
    file's (custkey, price) bounding box tighter, so the rectangle
    touches fewer files — read amplification ≤ Z-order's (asserted in
    tests on real data, hash-checked here against the SQL twin).

    Scale: identical shape to zonemap_prune_stats — two-phase global
    index per layout (no single-partition data sort), one file-stats
    aggregation, integer arithmetic on file summaries.
    """
    from ..operators.layout import (
        global_row_index,
        hilbert_xy2d,
        morton_z16,
    )

    o = _orders_quantized(spark, sf_dir)
    base = hilbert_xy2d(
        o.withColumn("zval", morton_z16(F.col("ck16"), F.col("pq16"))),
        "ck16",
        "pq16",
        "hval",
        order=_HB_ORDER,
    )
    lay_z = global_row_index(
        base, key="zval", tiebreak=("o_orderkey",)
    ).withColumn("layout", F.lit("zorder"))
    lay_h = global_row_index(
        base, key="hval", tiebreak=("o_orderkey",)
    ).withColumn("layout", F.lit("hilbert"))
    both = lay_z.unionByName(lay_h).withColumn(
        "file_id", F.floor((F.col("global_idx") - 1) / _HB_ROWS_PER_FILE)
    )
    match = (
        (F.col("ck16") >= _HB_CK_LO)
        & (F.col("ck16") < _HB_CK_HI)
        & (F.col("pq16") >= _HB_PQ_LO)
        & (F.col("pq16") < _HB_PQ_HI)
    )
    per_file = both.groupBy("layout", "file_id").agg(
        F.min("ck16").alias("ck_min"),
        F.max("ck16").alias("ck_max"),
        F.min("pq16").alias("pq_min"),
        F.max("pq16").alias("pq_max"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(match.cast("int")).cast("bigint").alias("n_match"),
    )
    hit = (
        (F.col("ck_max") >= _HB_CK_LO)
        & (F.col("ck_min") < _HB_CK_HI)
        & (F.col("pq_max") >= _HB_PQ_LO)
        & (F.col("pq_min") < _HB_PQ_HI)
    )
    scanned = F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("bigint")
    matching = F.sum("n_match").cast("bigint")
    return per_file.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(hit.cast("int")).cast("bigint").alias("n_files_read"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        scanned.alias("n_rows_scanned"),
        matching.alias("n_rows_matching"),
        F.when(
            matching > 0,
            F.round(scanned.cast("double") / matching.cast("double"), 4),
        ).alias("read_amplification"),
    )


def _hilbert_prune_sql() -> str:
    from ..operators.layout import hilbert_xy2d_sql, morton_z16_sql

    z = morton_z16_sql("ck16", "pq16")
    hsql = hilbert_xy2d_sql(
        "o_orderkey",
        "ck16",
        "pq16",
        "q",
        order=_HB_ORDER,
    )
    pred = (
        f"ck16 >= {_HB_CK_LO} AND ck16 < {_HB_CK_HI} "
        f"AND pq16 >= {_HB_PQ_LO} AND pq16 < {_HB_PQ_HI}"
    )
    hit = (
        f"ck_max >= {_HB_CK_LO} AND ck_min < {_HB_CK_HI} "
        f"AND pq_max >= {_HB_PQ_LO} AND pq_min < {_HB_PQ_HI}"
    )
    return f"""
WITH q AS (
  SELECT o_orderkey, o_custkey & {_HB_MASK} AS ck16,
         CAST(floor(o_totalprice / 32) AS BIGINT) & {_HB_MASK} AS pq16
  FROM orders
), hb AS (
  {hsql.replace(chr(10), " ")}
), b AS (
  SELECT q.o_orderkey, q.ck16, q.pq16, {z} AS zval, hb.hval
  FROM q JOIN hb ON q.o_orderkey = hb.o_orderkey
), lay AS (
  SELECT 'zorder' AS layout,
         row_number() OVER (ORDER BY zval, o_orderkey) AS gi, ck16, pq16
  FROM b
  UNION ALL
  SELECT 'hilbert',
         row_number() OVER (ORDER BY hval, o_orderkey), ck16, pq16
  FROM b
), f AS (
  SELECT layout, (gi - 1) // {_HB_ROWS_PER_FILE} AS file_id,
         MIN(ck16) AS ck_min, MAX(ck16) AS ck_max,
         MIN(pq16) AS pq_min, MAX(pq16) AS pq_max,
         COUNT(*)::BIGINT AS n_rows,
         SUM(CASE WHEN {pred} THEN 1 ELSE 0 END)::BIGINT AS n_match
  FROM lay GROUP BY 1, 2
)
SELECT layout, COUNT(*)::BIGINT AS n_files,
  SUM(CASE WHEN {hit} THEN 1 ELSE 0 END)::BIGINT AS n_files_read,
  SUM(n_rows)::BIGINT AS n_rows,
  SUM(CASE WHEN {hit} THEN n_rows ELSE 0 END)::BIGINT AS n_rows_scanned,
  SUM(n_match)::BIGINT AS n_rows_matching,
  CASE WHEN SUM(n_match) > 0 THEN
    ROUND(SUM(CASE WHEN {hit} THEN n_rows ELSE 0 END)::DOUBLE
          / SUM(n_match)::DOUBLE, 4)
  END AS read_amplification
FROM f GROUP BY 1
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register(
        "compaction_plan_events", compaction_plan_events, COMPACTION_PLAN_SQL
    )
    register("join_skew_report", join_skew_report, JOIN_SKEW_SQL)
    register("hilbert_key_orders", hilbert_key_orders, _hilbert_key_sql())
    register("hilbert_prune_stats", hilbert_prune_stats, _hilbert_prune_sql())
