"""Behavioral-analytics entries: funnel conversion and cohort
retention — the two queries every event-warehouse dashboard runs.

Both reduce the events fact to per-user aggregates in ONE hash
aggregation (min event time per stage, conditional on type), then do
metadata-scale arithmetic on top. No window over the raw fact, no
self-joins — the shapes that survive a 100 TB event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users counted at stage k only if their first
    'view' ≤ first 'click' ≤ first 'purchase' so far (strictly ordered
    first-touch funnel). ONE groupBy(user) computes the three first
    -touch times; the stage logic is row-local arithmetic; the final
    stage counts aggregate 3 booleans."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in FUNNEL_STAGES
        ]
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_view"))
    s3 = (
        s2
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    )
    return firsts.agg(
        F.sum(s1.cast("long")).alias("n_view"),
        F.sum(s2.cast("long")).alias("n_view_click"),
        F.sum(s3.cast("long")).alias("n_view_click_purchase"),
    )


FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_view,
  SUM(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
           THEN 1 ELSE 0 END)::BIGINT AS n_view_click,
  SUM(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
            AND t_purchase >= t_click
           THEN 1 ELSE 0 END)::BIGINT AS n_view_click_purchase
FROM firsts
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted as retained in week offset k if they have ANY event k weeks
    after their cohort week. Two hash aggregations — (user → cohort
    week) and (cohort, offset → distinct users) — the standard retention
    triangle, no per-user windows."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = F.date_trunc("week", F.col("ts"))
    cohorts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        active.join(cohorts, "user_id")
        .withColumn(
            "week_offset",
            F.datediff(F.col("active_week"), F.col("cohort_week")) / 7,
        )
        .withColumn("week_offset", F.col("week_offset").cast("long"))
        # present the week as an ISO date STRING: Spark's date_trunc
        # yields a timestamp where DuckDB's yields a date — strings are
        # the one presentation both gate canonicalizers agree on
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


COHORT_SQL = """
WITH cohorts AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       (date_diff('day', c.cohort_week, a.active_week) / 7)::BIGINT AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("funnel_conversion", funnel_conversion, FUNNEL_SQL)
    register("cohort_retention", cohort_retention, COHORT_SQL)
