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


# strata present at every fixture scale (sf0.001 has only 15 users and
# no 'view' first-events; 'error'/'signup' cohorts exist everywhere)
_LR_A = "error"
_LR_B = "signup"


def logrank_test_userlife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test comparing the survival of the
    '{a}'-acquired vs '{b}'-acquired cohorts (same subjects/durations/
    censoring as `kaplan_meier_userlife`): at every event time the
    observed group-A events are compared against the hypergeometric
    expectation E₁ = d·n₁/n with variance
    d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1), and Z = (O₁−E₁)/√ΣV — the
    curve-level significance readout that completes the survival
    family (KM curve → log-rank comparison).

    Determinism: O/d/n counts are exact integers; each E/V term is the
    literal product chain ((d·r)·(1−r))·((n−d)/(n−1)) with r = n₁/n
    one double division; terms sum through DECIMAL(20,8); Z is one
    final division and one IEEE sqrt.

    Scale: the subjects aggregation is the only full-data pass; event
    times are calendar-bounded so the risk-set windows and the 1-row
    summary are metadata-side.
    """
    ev = load_table(spark, sf_dir, "events")
    okey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    subjects = (
        ev.groupBy("user_id")
        .agg(
            F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts")))
            .cast("bigint")
            .alias("t"),
            (F.max_by("event_type", okey) == _OBSERVED_TYPE)
            .cast("int")
            .alias("observed"),
            F.min_by("event_type", okey).alias("stratum"),
        )
        .filter(F.col("stratum").isin(_LR_A, _LR_B))
    )
    in_a = (F.col("stratum") == _LR_A).cast("int")
    at_t = subjects.groupBy("t").agg(
        F.sum(F.col("observed") * in_a).cast("bigint").alias("d1"),
        F.sum((1 - F.col("observed")) * in_a).cast("bigint").alias("c1"),
        F.sum(F.col("observed") * (1 - in_a)).cast("bigint").alias("d2"),
        F.sum((1 - F.col("observed")) * (1 - in_a)).cast("bigint").alias("c2"),
    )
    w_suffix = (
        Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = (
        at_t.withColumn(
            "n1", F.sum(F.col("d1") + F.col("c1")).over(w_suffix)
        )
        .withColumn("n2", F.sum(F.col("d2") + F.col("c2")).over(w_suffix))
        .withColumn("n", F.col("n1") + F.col("n2"))
        .withColumn("d", F.col("d1") + F.col("d2"))
        .filter(F.col("d") > 0)
    )
    r = F.col("n1").cast("double") / F.col("n").cast("double")
    e_term = F.col("d").cast("double") * r
    # the n>1 guard must live INSIDE the division (null divisor → null,
    # no ANSI error): Spark's common-subexpression elimination hoists
    # the division out of a WHEN guard and trips DIVIDE_BY_ZERO
    v_term = (
        (F.col("d").cast("double") * r)
        * (F.lit(1.0) - r)
        * (
            (F.col("n") - F.col("d")).cast("double")
            / F.when(F.col("n") > 1, (F.col("n") - 1).cast("double"))
        )
    )
    agg = risk.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum(e_term.cast("decimal(20,8)")).cast("double").alias("e1"),
        F.sum(
            F.when(F.col("n") > 1, v_term).otherwise(0.0).cast("decimal(20,8)")
        )
        .cast("double")
        .alias("v"),
    )
    counts = subjects.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.sum(in_a).cast("bigint").alias("n_group_a"),
    )
    # degenerate-data guard (a cohort pair with no shared risk sets has
    # V = 0): null z/chi2 instead of a divide-by-zero — guard inside
    # the divisor so CSE can't hoist an unguarded division
    z = (F.col("o1").cast("double") - F.col("e1")) / F.sqrt(
        F.when(F.col("v") > 0, F.col("v"))
    )
    return agg.join(F.broadcast(counts)).select(
        "n_subjects",
        "n_group_a",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("v", 6).alias("var_sum"),
        F.round(z, 6).alias("z"),
        F.round(z * z, 6).alias("chi2"),
    )


logrank_test_userlife.__doc__ = logrank_test_userlife.__doc__.format(
    a=_LR_A, b=_LR_B
)


LOGRANK_SQL = f"""
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
), two AS (
  SELECT t, observed,
    CASE WHEN stratum = '{_LR_A}' THEN 1 ELSE 0 END AS in_a
  FROM subjects WHERE stratum IN ('{_LR_A}', '{_LR_B}')
), at_t AS (
  SELECT t,
    SUM(observed * in_a)::BIGINT AS d1,
    SUM((1 - observed) * in_a)::BIGINT AS c1,
    SUM(observed * (1 - in_a))::BIGINT AS d2,
    SUM((1 - observed) * (1 - in_a))::BIGINT AS c2
  FROM two GROUP BY t
), risk AS (
  SELECT t, d1, d2,
    (SUM(d1 + c1) OVER (ORDER BY t
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))::BIGINT AS n1,
    (SUM(d2 + c2) OVER (ORDER BY t
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))::BIGINT AS n2
  FROM at_t
), terms AS (
  SELECT d1, d1 + d2 AS d, n1 + n2 AS n, n1 FROM risk WHERE d1 + d2 > 0
), agg AS (
  SELECT SUM(d1)::BIGINT AS o1,
    CAST(CAST(SUM(CAST(d::DOUBLE * (n1::DOUBLE / n::DOUBLE)
         AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS e1,
    CAST(CAST(SUM(CAST(CASE WHEN n > 1 THEN
         (d::DOUBLE * (n1::DOUBLE / n::DOUBLE))
           * (1.0 - n1::DOUBLE / n::DOUBLE)
           * ((n - d)::DOUBLE / (n - 1)::DOUBLE)
         ELSE 0.0 END AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS v
  FROM terms
), counts AS (
  SELECT COUNT(*)::BIGINT AS n_subjects, SUM(in_a)::BIGINT AS n_group_a
  FROM two
)
SELECT n_subjects, n_group_a, o1,
  ROUND(e1, 6) AS e1,
  ROUND(v, 6) AS var_sum,
  ROUND((o1::DOUBLE - e1) / sqrt(CASE WHEN v > 0 THEN v END), 6) AS z,
  ROUND(((o1::DOUBLE - e1) / sqrt(CASE WHEN v > 0 THEN v END))
        * ((o1::DOUBLE - e1) / sqrt(CASE WHEN v > 0 THEN v END)), 6)
    AS chi2
FROM agg CROSS JOIN counts
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register("kaplan_meier_userlife", kaplan_meier_userlife, KAPLAN_MEIER_SQL)
    register("logrank_test_userlife", logrank_test_userlife, LOGRANK_SQL)
