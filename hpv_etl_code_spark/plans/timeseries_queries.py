"""Time-series statistics entries (round 5, session 4): autocorrelation
function of the daily revenue series and linear-interpolation gap
filling — the diagnostics/densify pair between `resample_ffill_hourly`
(carry-forward fill, analytics_queries.py) and `dow_seasonality_events`
(seasonal profile, governance_queries.py). The reference pipeline
(``/root/reference/src/main.py:1-141``) has no temporal statistics;
this extends the north-star surface.

Determinism contract: the series is integer cents; ACF terms are
mean-centered WITHOUT division (dᵗ = n·xᵗ − S stays a BIGINT, the n²
factors cancel in the ratio), term products and sums ride
DECIMAL(38,0) (exact), and each output float is one double division of
string-round-tripped decimals rounded to 6dp. Interpolated values are
v_prev + (Δv·Δd)/span — two IEEE ops on exactly-representable
integers, the identical chain in the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

_ACF_MAX_LAG = 7


def _cents(col: str = "value"):  # noqa: ANN202
    return (F.col(col).cast("decimal(12,2)") * 100).cast("bigint")


def acf_daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily total-cents series at lags 1..7:
    r_k = Σₜ dₜ·dₜ₊ₖ / Σₜ dₜ² with dₜ = n·xₜ − S (the ÷n-free
    mean-centering — multiplying through by n leaves every term an
    exact integer and the n² factors cancel in the ratio). Lags step
    over the OBSERVED day sequence (days with no events don't produce
    zero rows; the gap-fill entry below is the densify path).

    Scale: the raw table collapses to one day-grained aggregate
    (calendar-bounded — ≤ a few thousand rows no matter the input
    size), so the lag windows, centering, and the 7-row summary all run
    on metadata. The only full-data pass is the first groupBy(day),
    which partial-aggregates map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(_cents()).alias("x")
    )
    totals = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    w = Window.orderBy("d")
    centered = daily.join(F.broadcast(totals)).select(
        (F.col("n") * F.col("x") - F.col("s")).alias("dev"),
        *[
            (
                F.col("n") * F.lead("x", k).over(w) - F.col("s")
            ).alias(f"dev{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    stacked = centered.select(
        F.col("dev"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("lag"),
                        F.col(f"dev{k}").alias("devk"),
                    )
                    for k in range(1, _ACF_MAX_LAG + 1)
                ]
            )
        ).alias("lg"),
    ).select("dev", F.col("lg.lag").alias("lag"), F.col("lg.devk").alias("devk"))
    denom = centered.agg(
        F.sum(
            F.col("dev").cast("decimal(19,0)") * F.col("dev").cast("decimal(19,0)")
        ).alias("den")
    )
    per_lag = (
        stacked.filter(F.col("devk").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.col("dev").cast("decimal(19,0)")
                * F.col("devk").cast("decimal(19,0)")
            ).alias("num"),
        )
    )
    return per_lag.join(F.broadcast(denom)).select(
        "lag",
        "n_pairs",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("acf"),
    )


ACF_DAILY_SQL = f"""
WITH daily AS (
  SELECT ts::DATE AS d, SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS x
  FROM events GROUP BY 1
), totals AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS s FROM daily
), centered AS (
  SELECT (n * x - s)::BIGINT AS dev,
    {", ".join(
        f"(n * lead(x, {k}) OVER (ORDER BY d) - s)::BIGINT AS dev{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )}
  FROM daily CROSS JOIN totals
), denom AS (
  SELECT SUM(dev::DECIMAL(19,0) * dev::DECIMAL(19,0)) AS den FROM centered
), stacked AS (
  {" UNION ALL ".join(
      f"SELECT {k}::BIGINT AS lag, dev, dev{k} AS devk FROM centered"
      for k in range(1, _ACF_MAX_LAG + 1)
  )}
), per_lag AS (
  SELECT lag, COUNT(*)::BIGINT AS n_pairs,
         SUM(dev::DECIMAL(19,0) * devk::DECIMAL(19,0)) AS num
  FROM stacked WHERE devk IS NOT NULL GROUP BY lag
)
SELECT lag, n_pairs,
  ROUND(CAST(CAST(num AS VARCHAR) AS DOUBLE)
        / CAST(CAST(den AS VARCHAR) AS DOUBLE), 6) AS acf
FROM per_lag CROSS JOIN denom
"""


def gapfill_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify the per-event-type daily cents series over each type's
    own [min, max] calendar span and LINEARLY interpolate missing days
    between their observed neighbors:
    v = v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev) —
    the charting/feature-prep companion to the carry-forward fill
    (`resample_ffill_hourly`). Span endpoints are always observed, so
    every gap has both neighbors.

    Determinism: Δv·Δd is an exact BIGINT; the interpolation is one
    double division plus one addition on exactly-representable
    integers — the identical IEEE chain in the oracle.

    Scale: same shape as the ffill entry — one day-grained aggregate,
    a tiny span table, a sequence-explode grid bounded by
    types × calendar days (NOT rows), a co-partitioned left join, and
    two IGNORE NULLS windows per type over the metadata-sized grid.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(_cents()).alias("v"))
    spans = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    w_prev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined = (
        grid.join(daily, ["event_type", "d"], "left")
        .withColumn("v_prev", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn(
            "d_prev",
            F.last(
                F.when(F.col("v").isNotNull(), F.col("d")), ignorenulls=True
            ).over(w_prev),
        )
        .withColumn("v_next", F.first("v", ignorenulls=True).over(w_next))
        .withColumn(
            "d_next",
            F.first(
                F.when(F.col("v").isNotNull(), F.col("d")), ignorenulls=True
            ).over(w_next),
        )
    )
    interp = F.col("v_prev").cast("double") + (
        (F.col("v_next") - F.col("v_prev"))
        * F.datediff("d", "d_prev").cast("bigint")
    ).cast("double") / F.datediff("d_next", "d_prev").cast("double")
    return joined.select(
        "event_type",
        "d",
        F.col("v").isNull().alias("is_gap"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v").cast("double")).otherwise(
                interp
            ),
            6,
        ).alias("cents"),
    )


GAPFILL_SQL = """
WITH daily AS (
  SELECT event_type, ts::DATE AS d,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS v
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
  FROM (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1)
), joined AS (
  SELECT g.event_type, g.d, daily.v,
    last_value(daily.v IGNORE NULLS) OVER w_prev AS v_prev,
    last_value(CASE WHEN daily.v IS NOT NULL THEN g.d END IGNORE NULLS)
      OVER w_prev AS d_prev,
    first_value(daily.v IGNORE NULLS) OVER w_next AS v_next,
    first_value(CASE WHEN daily.v IS NOT NULL THEN g.d END IGNORE NULLS)
      OVER w_next AS d_next
  FROM grid g LEFT JOIN daily ON daily.event_type = g.event_type AND daily.d = g.d
  WINDOW
    w_prev AS (PARTITION BY g.event_type ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY g.event_type ORDER BY g.d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, d, v IS NULL AS is_gap,
  ROUND(CASE WHEN v IS NOT NULL THEN v::DOUBLE
        ELSE v_prev::DOUBLE
             + ((v_next - v_prev) * date_diff('day', d_prev, d))::DOUBLE
               / date_diff('day', d_prev, d_next)::DOUBLE
        END, 6) AS cents
FROM joined
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register("acf_daily_cents", acf_daily_cents, ACF_DAILY_SQL)
    register("gapfill_linear_interp", gapfill_linear_interp, GAPFILL_SQL)
