"""Survival-analysis entries (round 5, session 4): Kaplan–Meier
survival curves with Nelson–Aalen cumulative hazard — time-to-event
analytics over the events table (user lifetime = first→last event
span; "converted" users — last event is a purchase — are the observed
events, everyone else is right-censored at their last sighting).
Survival curves are the churn/retention readout no reference-style
pipeline ships but every production analytics engine needs; the
reference's surface (``/root/reference/src/main.py:1-141``) has no
temporal statistics at all, so this extends the north-star surface.

Determinism contract (the EWMA playbook from
``mining_queries.ewma_user_values``): all counting is exact integers;
each KM factor (n_i − d_i)/n_i is ONE double division; the running
product is an explicit left-fold ``1.0 · f_1 · f_2 ⋯ f_i`` whose IEEE
op chain the DuckDB twin replays verbatim (``list_reduce`` over
``list_prepend(1.0, …)``), so the hash matches bit-for-bit; the
Nelson–Aalen hazard sum rides DECIMAL(20,8) (exact, order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

_OBSERVED_TYPE = "purchase"


def kaplan_meier_userlife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimator per stratum (the user's FIRST event type,
    the acquisition channel stand-in): subjects are users, duration is
    whole days between first and last event, and the event is observed
    when the user's final event is a purchase (otherwise censored).
    For each distinct event time t the row reports the at-risk count
    n(t) = #subjects with duration ≥ t, the event/censor counts at t,
    the KM survival S(t) = ∏_{tᵢ ≤ t, dᵢ>0} (1 − dᵢ/nᵢ) and the
    Nelson–Aalen cumulative hazard H(t) = Σ dᵢ/nᵢ.

    Scale: one (user) aggregation reduces N rows to U subjects, one
    (stratum, t) aggregation reduces U subjects to at most
    strata × max-duration-days summary rows — the curve itself is
    METADATA-sized (duration is day-granular, so the per-stratum
    summary array the fold walks is bounded by the calendar span, not
    by the row count; a 100 TB events table still folds over ≤ a few
    thousand (t, factor) structs per stratum). The at-risk count is a
    suffix sum over that summary (one window, no join back to
    subjects), and the prefix products run over the same bounded
    array — quadratic in #distinct-times but distinct times are
    calendar-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    # composite order key: zero-padded epoch-micros + event_id — a
    # string both engines compare identically (DuckDB's arg_max/min
    # rejects struct keys, so struct(ts, event_id) is not portable)
    okey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    subjects = ev.groupBy("user_id").agg(
        F.datediff(
            F.to_date(F.max("ts")), F.to_date(F.min("ts"))
        )
        .cast("bigint")
        .alias("t"),
        (F.max_by("event_type", okey) == _OBSERVED_TYPE)
        .cast("int")
        .alias("observed"),
        F.min_by("event_type", okey).alias("stratum"),
    )
    at_t = subjects.groupBy("stratum", "t").agg(
        F.sum("observed").cast("bigint").alias("n_event"),
        F.sum(1 - F.col("observed")).cast("bigint").alias("n_censored"),
    )
    # at-risk = subjects still under observation at t = suffix sum of
    # (events + censored) over times ≥ t — censored-only times count
    # toward risk sets even though they never appear as curve rows
    w_suffix = (
        Window.partitionBy("stratum")
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = at_t.withColumn(
        "n_risk",
        F.sum(F.col("n_event") + F.col("n_censored")).over(w_suffix),
    ).filter(F.col("n_event") > 0)
    factor = (F.col("n_risk") - F.col("n_event")).cast("double") / F.col(
        "n_risk"
    ).cast("double")
    hazard_term = F.col("n_event").cast("double") / F.col("n_risk").cast(
        "double"
    )
    w_curve = Window.partitionBy("stratum").orderBy("t")
    w_all = Window.partitionBy("stratum")
    km = (
        risk.withColumn("factor", factor)
        .withColumn("rn", F.row_number().over(w_curve))
        .withColumn(
            "factors",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("t", "factor")).over(w_all)
                ),
                lambda s: s["factor"],
            ),
        )
        .withColumn(
            "cum_hazard",
            F.sum(hazard_term.cast("decimal(20,8)")).over(w_curve),
        )
    )
    survival = F.aggregate(
        F.slice("factors", F.lit(1), F.col("rn")),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return km.select(
        "stratum",
        F.col("t").alias("t_days"),
        "n_risk",
        "n_event",
        "n_censored",
        F.round(survival, 6).alias("survival"),
        F.round(F.col("cum_hazard").cast("double"), 6).alias("cum_hazard"),
    )


KAPLAN_MEIER_SQL = f"""
WITH subjects AS (
  SELECT user_id,
    date_diff('day', MIN(ts)::DATE, MAX(ts)::DATE)::BIGINT AS t,
    CASE WHEN arg_max(event_type,
           lpad(epoch_us(ts)::VARCHAR, 20, '0')
             || lpad(event_id::VARCHAR, 12, '0')) = '{_OBSERVED_TYPE}'
         THEN 1 ELSE 0 END AS observed,
    arg_min(event_type,
            lpad(epoch_us(ts)::VARCHAR, 20, '0')
              || lpad(event_id::VARCHAR, 12, '0')) AS stratum
  FROM events GROUP BY user_id
), at_t AS (
  SELECT stratum, t,
         SUM(observed)::BIGINT AS n_event,
         SUM(1 - observed)::BIGINT AS n_censored
  FROM subjects GROUP BY 1, 2
), risk AS (
  SELECT stratum, t, n_event, n_censored,
    (SUM(n_event + n_censored) OVER (
       PARTITION BY stratum ORDER BY t
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))::BIGINT AS n_risk
  FROM at_t
), km AS (
  SELECT stratum, t, n_event, n_censored, n_risk,
    (n_risk - n_event)::DOUBLE / n_risk::DOUBLE AS factor,
    row_number() OVER (PARTITION BY stratum ORDER BY t) AS rn,
    SUM(CAST(n_event::DOUBLE / n_risk::DOUBLE AS DECIMAL(20,8))) OVER (
      PARTITION BY stratum ORDER BY t ROWS UNBOUNDED PRECEDING
    ) AS cum_hazard
  FROM risk WHERE n_event > 0
), arrs AS (
  SELECT stratum, list(factor ORDER BY t) AS factors
  FROM km GROUP BY stratum
)
SELECT km.stratum, km.t AS t_days, km.n_risk, km.n_event, km.n_censored,
  ROUND(list_reduce(
          list_prepend(1.0::DOUBLE, arrs.factors[1:km.rn]),
          (acc, x) -> acc * x), 6) AS survival,
  ROUND(CAST(CAST(km.cum_hazard AS VARCHAR) AS DOUBLE), 6) AS cum_hazard
FROM km JOIN arrs USING (stratum)
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register("kaplan_meier_userlife", kaplan_meier_userlife, KAPLAN_MEIER_SQL)
