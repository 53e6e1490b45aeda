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


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register(
        "compaction_plan_events", compaction_plan_events, COMPACTION_PLAN_SQL
    )
    register("join_skew_report", join_skew_report, JOIN_SKEW_SQL)
