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


# --------------------------------------------- Holt linear smoothing

_HOLT_ALPHA = 0.3
_HOLT_BETA = 0.1
_HOLT_CHUNK = 32  # fixture-scale; size to ~4096 in production


def _holt_consts() -> tuple[float, float, float, float]:
    """The constant affine matrix A of the Holt recurrence
    sₜ = A·sₜ₋₁ + cₜ with state s = (level, trend) and forcing
    cₜ = (α·xₜ, αβ·xₜ):  A = [[1−α, 1−α], [−αβ, 1−αβ]]."""
    a, b = _HOLT_ALPHA, _HOLT_BETA
    return 1.0 - a, 1.0 - a, -(a * b), 1.0 - a * b


def _affine_compose(acc, e):  # noqa: ANN001 — Column struct lambda
    """(F_e, c_e) ∘ (F_acc, p_acc) — the element/chunk map applied
    AFTER the accumulated map: F = F_e·F_acc, p = F_e·p_acc + c_e.
    Literal sum-of-two-products op order; the DuckDB twin replays the
    identical IEEE chain."""
    return F.struct(
        (e["f11"] * acc["f11"] + e["f12"] * acc["f21"]).alias("f11"),
        (e["f11"] * acc["f12"] + e["f12"] * acc["f22"]).alias("f12"),
        (e["f21"] * acc["f11"] + e["f22"] * acc["f21"]).alias("f21"),
        (e["f21"] * acc["f12"] + e["f22"] * acc["f22"]).alias("f22"),
        (e["f11"] * acc["p1"] + e["f12"] * acc["p2"] + e["p1"]).alias("p1"),
        (e["f21"] * acc["p1"] + e["f22"] * acc["p2"] + e["p2"]).alias("p2"),
    )


def _identity_struct():  # noqa: ANN202
    return F.struct(
        F.lit(1.0).alias("f11"),
        F.lit(0.0).alias("f12"),
        F.lit(0.0).alias("f21"),
        F.lit(1.0).alias("f22"),
        F.lit(0.0).alias("p1"),
        F.lit(0.0).alias("p2"),
    )


def holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per user — the
    MATRIX generalization of `mining_queries.ewma_user_values`'s scalar
    segmented fold: the recurrence lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁ is the affine map sₜ = A·sₜ₋₁ + cₜ
    with CONSTANT A, so each element is a 2×2 affine map, affine maps
    compose associatively, and the user's history folds as a SEGMENTED
    scan: chunks of ≤{chunk} elements fold to one (F, p) summary each,
    summaries compose in cid order, and the total map is applied once
    to the seed (l₂ = x₂, b₂ = x₂−x₁; the recurrence starts at t=3 —
    textbook Holt initialization; single-event users get b = 0).

    Determinism: every step is the SAME generic affine composition
    (sum-of-two-products literal order) in Spark's ``aggregate`` and
    DuckDB's ``list_reduce``, so the hash matches bit-for-bit.

    Scale: identical shape to the segmented EWMA — per-chunk tasks
    hold ≤{chunk} doubles, the per-user compose holds n/{chunk}
    six-double summaries (√n memory at the default sizing; recurse the
    decomposition for more), and the chunk aggregation reuses the
    user_id hash partitioning (groupBy(user_id, cid) co-partitions).
    Forecast column: ŷ(t+3) = level + 3·trend.
    """
    ev = load_table(spark, sf_dir, "events")
    return holt_segments(ev, chunk=_HOLT_CHUNK)


def holt_segments(ev: DataFrame, chunk: int = _HOLT_CHUNK) -> DataFrame:
    """Segmented Holt fold over an arbitrary events frame — the 6dp
    output is chunk-size-invariant (property-tested against the
    whole-history fold at several widths); raw IEEE bits are not
    (reassociation), exactly as documented for `ewma_segments`."""
    f11c, f12c, f21c, f22c = _holt_consts()
    a, ab = _HOLT_ALPHA, _HOLT_ALPHA * _HOLT_BETA
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("v")
    ).withColumn("rn", F.row_number().over(w))
    seeds = ordered.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(F.when(F.col("rn") == 1, F.col("v"))).alias("x1"),
        F.max(F.when(F.col("rn") == 2, F.col("v"))).alias("x2"),
    )
    elem = lambda x: F.struct(  # noqa: E731 — elementary map of one step
        F.lit(f11c).alias("f11"),
        F.lit(f12c).alias("f12"),
        F.lit(f21c).alias("f21"),
        F.lit(f22c).alias("f22"),
        (F.lit(a) * x).alias("p1"),
        (F.lit(ab) * x).alias("p2"),
    )
    ys = F.transform(
        F.array_sort(F.collect_list(F.struct("rn", "v"))), lambda s: s["v"]
    )
    summaries = (
        ordered.filter(F.col("rn") >= 3)
        .withColumn("cid", F.expr(f"(rn - 3) DIV {chunk}"))
        .groupBy("user_id", "cid")
        .agg(
            F.aggregate(
                ys, _identity_struct(), lambda acc, x: _affine_compose(acc, elem(x))
            ).alias("cs")
        )
    )
    per_user = summaries.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("cid", "cs"))).alias("maps")
    )
    total = F.aggregate(
        F.coalesce(
            F.transform("maps", lambda m: m["cs"]),
            F.array().cast(
                "array<struct<f11:double,f12:double,f21:double,"
                "f22:double,p1:double,p2:double>>"
            ),
        ),
        _identity_struct(),
        _affine_compose,
    )
    joined = seeds.join(per_user, "user_id", "left").withColumn("tm", total)
    l0 = F.coalesce(F.col("x2"), F.col("x1"))
    b0 = F.coalesce(F.col("x2") - F.col("x1"), F.lit(0.0))
    level = F.col("tm.f11") * l0 + F.col("tm.f12") * b0 + F.col("tm.p1")
    trend = F.col("tm.f21") * l0 + F.col("tm.f22") * b0 + F.col("tm.p2")
    return joined.select(
        "user_id",
        "n_events",
        F.round(level, 6).alias("level"),
        F.round(trend, 6).alias("trend"),
        F.round(level + F.lit(3.0) * trend, 6).alias("forecast_h3"),
    )


def _holt_sql(chunk: int = _HOLT_CHUNK) -> str:
    """The DuckDB twin folds DOUBLE[6] LIST accumulators, not structs:
    this container's DuckDB (v1.0.0) updates a struct accumulator's
    fields IN PLACE left-to-right inside ``list_reduce``, so a later
    field expression reads the already-overwritten earlier fields —
    fatal for a matrix compose where every output needs every old
    input (verified: f21' came back as e.f21·f11_NEW + e.f22·f21_old).
    List construction builds a fresh list per step, so [..] 6-lists
    carry (f11,f12,f21,f22,p1,p2) with value semantics and the exact
    Spark op chain."""
    f11c, f12c, f21c, f22c = _holt_consts()
    a, ab = _HOLT_ALPHA, _HOLT_ALPHA * _HOLT_BETA
    ident = "[1.0,0.0,0.0,1.0,0.0,0.0]::DOUBLE[]"
    elem_step = f"""(acc, e) -> [
      {f11c!r}*acc[1] + {f12c!r}*acc[3],
      {f11c!r}*acc[2] + {f12c!r}*acc[4],
      {f21c!r}*acc[1] + {f22c!r}*acc[3],
      {f21c!r}*acc[2] + {f22c!r}*acc[4],
      {f11c!r}*acc[5] + {f12c!r}*acc[6] + e[1],
      {f21c!r}*acc[5] + {f22c!r}*acc[6] + e[2]]"""
    compose = """(acc, e) -> [
      e[1]*acc[1] + e[2]*acc[3],
      e[1]*acc[2] + e[2]*acc[4],
      e[3]*acc[1] + e[4]*acc[3],
      e[3]*acc[2] + e[4]*acc[4],
      e[1]*acc[5] + e[2]*acc[6] + e[5],
      e[3]*acc[5] + e[4]*acc[6] + e[6]]"""
    return f"""
WITH ordered AS (
  SELECT user_id, value::DOUBLE AS v,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), seeds AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_events,
    MAX(CASE WHEN rn = 1 THEN v END) AS x1,
    MAX(CASE WHEN rn = 2 THEN v END) AS x2
  FROM ordered GROUP BY user_id
), summaries AS (
  SELECT user_id, (rn - 3) // {chunk} AS cid,
    list_reduce(
      list_prepend({ident},
        list_transform(list(v ORDER BY rn), x -> [{a!r} * x, {ab!r} * x])),
      {elem_step}) AS cs
  FROM ordered WHERE rn >= 3 GROUP BY user_id, (rn - 3) // {chunk}
), per_user AS (
  SELECT user_id, list(cs ORDER BY cid) AS maps FROM summaries GROUP BY user_id
), folded AS (
  SELECT s.user_id, s.n_events, s.x1, s.x2,
    list_reduce(list_prepend({ident}, COALESCE(p.maps, [])),
                {compose}) AS tm
  FROM seeds s LEFT JOIN per_user p USING (user_id)
)
SELECT user_id, n_events,
  ROUND(tm[1] * COALESCE(x2, x1) + tm[2] * COALESCE(x2 - x1, 0.0) + tm[5],
        6) AS level,
  ROUND(tm[3] * COALESCE(x2, x1) + tm[4] * COALESCE(x2 - x1, 0.0) + tm[6],
        6) AS trend,
  ROUND((tm[1] * COALESCE(x2, x1) + tm[2] * COALESCE(x2 - x1, 0.0) + tm[5])
        + 3.0 * (tm[3] * COALESCE(x2, x1) + tm[4] * COALESCE(x2 - x1, 0.0)
                 + tm[6]), 6) AS forecast_h3
FROM folded
"""


def holt_simple_fold(ev: DataFrame) -> DataFrame:
    """Reference whole-history Holt fold (equivalence twin for the
    segmented entry, same role as `ewma_simple_fold`): per-key state is
    the key's entire history — OOMs on pathologically long keys; kept
    only for the chunk-size-invariance property test."""
    a, b = _HOLT_ALPHA, _HOLT_BETA
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    per_user = (
        ev.select("user_id", "ts", "event_id", F.col("value").cast("double").alias("value"))
        .groupBy("user_id")
        .agg(arr.alias("a"))
    )
    vals = F.transform("a", lambda s: s["value"])
    x1 = F.element_at(vals, 1)
    x2 = F.coalesce(F.element_at(vals, 2), x1)
    b0 = F.coalesce(F.element_at(vals, 2) - x1, F.lit(0.0))
    state = F.aggregate(
        F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0))),
        F.struct(x2.alias("l"), b0.alias("b")),
        lambda acc, x: F.struct(
            (
                F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])
            ).alias("l"),
            (
                F.lit(b)
                * (
                    (F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"]))
                    - acc["l"]
                )
                + F.lit(1.0 - b) * acc["b"]
            ).alias("b"),
        ),
    )
    return per_user.select(
        "user_id",
        F.size("a").cast("long").alias("n_events"),
        F.round(state["l"], 6).alias("level"),
        F.round(state["b"], 6).alias("trend"),
        F.round(state["l"] + F.lit(3.0) * state["b"], 6).alias("forecast_h3"),
    )


# --------------------------------------- classical seasonal decomposition


def seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily total-cents series
    with weekly seasonality: trend = CENTERED 7-day moving average
    (full windows only), detrended = x − trend, seasonal index =
    per-ISO-weekday mean of the detrended series, and the output
    reports each weekday's index plus the residual spread after
    removing both trend and seasonality — the decomposition readout
    behind `dow_seasonality_events`' raw profile.

    Determinism: daily sums are exact integer cents and the 7-day
    window SUM is an exact integer, so detrended = x − sum/7.0 is one
    double division plus one subtraction (identical chain in both
    engines); per-dow sums of detrended/|residual| terms ride
    DECIMAL(20,8) (exact, order-free); every reported float is a
    single final division rounded to 6dp.

    Scale: one day-grained aggregate (calendar-bounded) feeds one
    7-row window chain and a 7-group aggregate — all metadata after
    the first pass.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(_cents()).alias("x")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("w_sum", F.sum("x").over(w7))
        .withColumn("w_n", F.count("x").over(w7))
        .filter(F.col("w_n") == 7)  # full centered windows only
        .withColumn(
            "detr",
            F.col("x").cast("double")
            - F.col("w_sum").cast("double") / F.lit(7.0),
        )
        .withColumn("dow", (F.weekday("d") + 1).cast("bigint"))
    )
    seasonal = trended.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("detr").cast("decimal(20,8)")).alias("s_detr"),
    )
    with_idx = trended.join(F.broadcast(seasonal), "dow").withColumn(
        "resid",
        F.col("detr")
        - F.col("s_detr").cast("double") / F.col("n_days").cast("double"),
    )
    return (
        with_idx.groupBy("dow")
        .agg(
            F.max("n_days").alias("n_days"),
            F.max(
                F.col("s_detr").cast("double") / F.col("n_days").cast("double")
            ).alias("raw_idx"),
            F.sum(F.abs(F.col("resid")).cast("decimal(20,8)")).alias("s_abs"),
        )
        .select(
            "dow",
            "n_days",
            F.round("raw_idx", 6).alias("seasonal_idx"),
            F.round(
                F.col("s_abs").cast("double") / F.col("n_days").cast("double"),
                6,
            ).alias("mean_abs_resid"),
        )
    )


SEASONAL_DECOMP_SQL = """
WITH daily AS (
  SELECT ts::DATE AS d,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS x
  FROM events GROUP BY 1
), trended AS (
  SELECT d, x,
    SUM(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      AS w_sum,
    COUNT(x) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      AS w_n
  FROM daily
), detrended AS (
  SELECT isodow(d)::BIGINT AS dow,
         x::DOUBLE - w_sum::DOUBLE / 7.0 AS detr
  FROM trended WHERE w_n = 7
), seasonal AS (
  SELECT dow, COUNT(*)::BIGINT AS n_days,
         SUM(CAST(detr AS DECIMAL(20,8))) AS s_detr
  FROM detrended GROUP BY 1
)
SELECT t.dow, MAX(s.n_days) AS n_days,
  ROUND(MAX(CAST(CAST(s.s_detr AS VARCHAR) AS DOUBLE) / s.n_days::DOUBLE), 6)
    AS seasonal_idx,
  ROUND(CAST(CAST(SUM(CAST(abs(t.detr
          - CAST(CAST(s.s_detr AS VARCHAR) AS DOUBLE) / s.n_days::DOUBLE)
        AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / MAX(s.n_days)::DOUBLE, 6)
    AS mean_abs_resid
FROM detrended t JOIN seasonal s USING (dow)
GROUP BY t.dow
"""


_CCF_MAX_LAG = 7


def ccf_purchase_view_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily purchase-cents and
    view-cents series at lags 0..7: does view spend LEAD purchase spend,
    and by how many days? r_k = Σₜ dx(t)·dy(t+k) / √(Σdx²·Σdy²) — the
    lagged complement of ``acf_daily_cents`` (same ÷n-free centering).

    Series construction: calendar-DENSE day index from the observed
    bounds with zero-fill (a day with no purchases contributes 0 — the
    natural reading for a revenue series, and it makes the day axis a
    contiguous integer range so t+k is pure arithmetic, no existence
    join). dx = n·x − Sx stays an exact BIGINT; term products and both
    normalizers ride DECIMAL(38,0); each r_k is one double division of
    string-exact decimals.

    Scale: the fact collapses to one (day × type) aggregate
    (calendar-bounded), the dense axis is a broadcast 1-row sequence
    explode, and the lag join is metadata-sized — input volume only
    touches the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    day_tot = (
        ev.select(
            F.to_date("ts").alias("day"),
            "event_type",
            _cents().alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(F.sum("cents").cast("bigint").alias("c"))
    )
    bounds = day_tot.agg(
        F.min("day").alias("__d0"), F.max("day").alias("__d1")
    )
    axis = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("__d1"), F.col("__d0")))
        ).alias("t"),
        "__d0",
    ).select("t", F.date_add(F.col("__d0"), F.col("t")).alias("day"))
    x = day_tot.filter(F.col("event_type") == "purchase").select("day", "c")
    y = day_tot.filter(F.col("event_type") == "view").select("day", "c")
    series = (
        axis.join(x.withColumnRenamed("c", "__x"), "day", "left")
        .join(y.withColumnRenamed("c", "__y"), "day", "left")
        .select(
            "t",
            F.coalesce("__x", F.lit(0)).cast("bigint").alias("x"),
            F.coalesce("__y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    tot = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("x").cast("bigint").alias("__sx"),
        F.sum("y").cast("bigint").alias("__sy"),
    )
    d38 = "decimal(38,0)"
    dev = series.join(F.broadcast(tot)).select(
        "t",
        (F.col("__n") * F.col("x") - F.col("__sx")).alias("dx"),
        (F.col("__n") * F.col("y") - F.col("__sy")).alias("dy"),
    )
    norms = dev.agg(
        F.sum(F.col("dx").cast(d38) * F.col("dx").cast(d38)).alias("__nx"),
        F.sum(F.col("dy").cast(d38) * F.col("dy").cast(d38)).alias("__ny"),
    )
    lags = dev.sparkSession.range(0, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a, b = dev.alias("a"), dev.alias("b")
    pairs = (
        a.join(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("b.t") == F.col("a.t") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("a.dx").cast(d38) * F.col("b.dy").cast(d38)).alias(
                "__num"
            ),
        )
    )
    return (
        pairs.join(F.broadcast(norms))
        .select(
            "lag",
            "n_pairs",
            F.round(
                F.col("__num").cast("double")
                / F.sqrt(
                    F.col("__nx").cast("double") * F.col("__ny").cast("double")
                ),
                6,
            ).alias("ccf"),
        )
    )


CCF_SQL = f"""
WITH day_tot AS (
  SELECT ts::DATE AS day, event_type,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM day_tot
), axis AS (
  SELECT unnest(range(0, date_diff('day', d0, d1) + 1))::BIGINT AS t
  FROM bounds
), xy AS (
  SELECT date_diff('day', d0, day)::BIGINT AS t, event_type, c
  FROM day_tot CROSS JOIN bounds
), series AS (
  SELECT a.t, COALESCE(x.c, 0)::BIGINT AS x, COALESCE(y.c, 0)::BIGINT AS y
  FROM axis a
  LEFT JOIN xy x ON x.event_type = 'purchase' AND x.t = a.t
  LEFT JOIN xy y ON y.event_type = 'view' AND y.t = a.t
), tot AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy
  FROM series
), dev AS (
  SELECT t, (n * x - sx)::BIGINT AS dx, (n * y - sy)::BIGINT AS dy
  FROM series CROSS JOIN tot
), norms AS (
  SELECT SUM(dx::DECIMAL(38,0) * dx::DECIMAL(38,0)) AS nx,
         SUM(dy::DECIMAL(38,0) * dy::DECIMAL(38,0)) AS ny
  FROM dev
), pairs AS (
  SELECT lag, COUNT(*)::BIGINT AS n_pairs,
         SUM(a.dx::DECIMAL(38,0) * b.dy::DECIMAL(38,0)) AS num
  FROM dev a
  CROSS JOIN (SELECT unnest(range(0, {_CCF_MAX_LAG + 1}))::INT AS lag) l
  JOIN dev b ON b.t = a.t + lag
  GROUP BY lag
)
SELECT lag, n_pairs,
  ROUND(num::DOUBLE / sqrt(nx::DOUBLE * ny::DOUBLE), 6) AS ccf
FROM pairs CROSS JOIN norms
"""


def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic of the daily-revenue OLS residuals —
    the autocorrelation-of-residuals diagnostic (DW≈2 independent,
    →0 positive, →4 negative serial correlation) that says whether the
    trend fits of ``ols_segment_trend``/``theil_sen_daily_trend`` can
    be trusted, completing the trend kit (slope → significance →
    residual diagnostics).

    Determinism: the OLS normal equations use the ÷n-free integer
    sums (every numerator/denominator EXACT in DECIMAL(38,0), slope
    and intercept each ONE double division); residuals are the fixed
    3-op chain y − a − b·t; both quadratic sums ride DECIMAL(20,8) so
    they are partition/order-independent; the lag runs over the
    calendar-bounded day frame.

    Scale: one day-grain aggregate is the only full pass; the residual
    window and both sums touch ≤ a few thousand metadata rows.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(F.to_date("ts").alias("day"), _cents().alias("cents"))
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("c"))
    )
    d0 = days.agg(F.min("day").alias("__d0"))
    xs = days.join(F.broadcast(d0)).select(
        F.datediff(F.col("day"), F.col("__d0")).cast("bigint").alias("t"),
        "c",
    )
    d38 = "decimal(38,0)"
    sums = xs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("t").cast("bigint").alias("__st"),
        F.sum("c").cast("bigint").alias("__sc"),
        F.sum(F.col("t").cast(d38) * F.col("c").cast(d38)).alias("__stc"),
        F.sum(F.col("t").cast(d38) * F.col("t").cast(d38)).alias("__stt"),
    )
    n38 = F.col("n_days").cast(d38)
    slope = (
        (n38 * F.col("__stc") - F.col("__st").cast(d38) * F.col("__sc").cast(d38))
        .cast("double")
        / (
            n38 * F.col("__stt")
            - F.col("__st").cast(d38) * F.col("__st").cast(d38)
        ).cast("double")
    )
    fitted = sums.select(
        "n_days",
        slope.alias("__b"),
        (
            (F.col("__sc").cast("double") - slope * F.col("__st").cast("double"))
            / F.col("n_days").cast("double")
        ).alias("__a"),
    )
    resid = xs.join(F.broadcast(fitted)).select(
        "t",
        "n_days",
        "__a",
        "__b",
        (
            F.col("c").cast("double")
            - F.col("__a")
            - F.col("__b") * F.col("t").cast("double")
        ).alias("e"),
    )
    w = Window.orderBy("t")
    diffs = resid.withColumn("__ep", F.lag("e").over(w))
    d20 = "decimal(20,8)"
    agg = diffs.agg(
        F.max("n_days").alias("n_days"),
        F.round(F.max("__b"), 6).alias("slope_cents_per_day"),
        F.round(F.max("__a"), 6).alias("intercept_cents"),
        F.sum(
            F.when(
                F.col("__ep").isNotNull(),
                ((F.col("e") - F.col("__ep")) * (F.col("e") - F.col("__ep"))).cast(
                    d20
                ),
            )
        )
        .cast("double")
        .alias("__num"),
        F.sum((F.col("e") * F.col("e")).cast(d20)).cast("double").alias("__den"),
    )
    return agg.select(
        "n_days",
        "slope_cents_per_day",
        "intercept_cents",
        F.round(F.col("__num") / F.col("__den"), 6).alias("durbin_watson"),
    )


DURBIN_WATSON_SQL = """
WITH days AS (
  SELECT ts::DATE AS day,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1
), d0 AS (
  SELECT MIN(day) AS d0 FROM days
), xs AS (
  SELECT date_diff('day', d0, day)::BIGINT AS t, c FROM days CROSS JOIN d0
), sums AS (
  SELECT COUNT(*)::BIGINT AS n_days, SUM(t)::BIGINT AS st,
         SUM(c)::BIGINT AS sc,
         SUM(t::DECIMAL(38,0) * c::DECIMAL(38,0)) AS stc,
         SUM(t::DECIMAL(38,0) * t::DECIMAL(38,0)) AS stt
  FROM xs
), fitted AS (
  SELECT n_days,
    (n_days::DECIMAL(38,0) * stc - st::DECIMAL(38,0) * sc::DECIMAL(38,0))::DOUBLE
      / (n_days::DECIMAL(38,0) * stt - st::DECIMAL(38,0) * st::DECIMAL(38,0))::DOUBLE
      AS b,
    (sc::DOUBLE
     - ((n_days::DECIMAL(38,0) * stc - st::DECIMAL(38,0) * sc::DECIMAL(38,0))::DOUBLE
        / (n_days::DECIMAL(38,0) * stt - st::DECIMAL(38,0) * st::DECIMAL(38,0))::DOUBLE)
       * st::DOUBLE) / n_days::DOUBLE AS a
  FROM sums
), resid AS (
  SELECT t, n_days, a, b, c::DOUBLE - a - b * t::DOUBLE AS e
  FROM xs CROSS JOIN fitted
), diffs AS (
  SELECT n_days, a, b, e, LAG(e) OVER (ORDER BY t) AS ep FROM resid
)
SELECT MAX(n_days) AS n_days,
  ROUND(MAX(b), 6) AS slope_cents_per_day,
  ROUND(MAX(a), 6) AS intercept_cents,
  ROUND(
    CAST(CAST(SUM(CASE WHEN ep IS NOT NULL
                  THEN CAST((e - ep) * (e - ep) AS DECIMAL(20,8)) END)
         AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(CAST(e * e AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
    AS durbin_watson
FROM diffs
"""


def _daily_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-filled dense (t, x=purchase cents, y=view cents) daily
    series shared by :func:`ccf_purchase_view_daily` and the rank
    correlations below (same construction, same determinism notes)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    day_tot = (
        ev.select(
            F.to_date("ts").alias("day"),
            "event_type",
            _cents().alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(F.sum("cents").cast("bigint").alias("c"))
    )
    bounds = day_tot.agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
    axis = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("__d1"), F.col("__d0")))
        ).alias("t"),
        "__d0",
    ).select("t", F.date_add(F.col("__d0"), F.col("t")).alias("day"))
    x = day_tot.filter(F.col("event_type") == "purchase").select("day", "c")
    y = day_tot.filter(F.col("event_type") == "view").select("day", "c")
    return (
        axis.join(x.withColumnRenamed("c", "__x"), "day", "left")
        .join(y.withColumnRenamed("c", "__y"), "day", "left")
        .select(
            "t",
            F.coalesce("__x", F.lit(0)).cast("bigint").alias("x"),
            F.coalesce("__y", F.lit(0)).cast("bigint").alias("y"),
        )
    )


_DAILY_XY_SQL = """
day_tot AS (
  SELECT ts::DATE AS day, event_type,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM day_tot
), axis AS (
  SELECT unnest(range(0, date_diff('day', d0, d1) + 1))::BIGINT AS t
  FROM bounds
), xy0 AS (
  SELECT date_diff('day', d0, day)::BIGINT AS t, event_type, c
  FROM day_tot CROSS JOIN bounds
), series AS (
  SELECT a.t, COALESCE(x.c, 0)::BIGINT AS x, COALESCE(y.c, 0)::BIGINT AS y
  FROM axis a
  LEFT JOIN xy0 x ON x.event_type = 'purchase' AND x.t = a.t
  LEFT JOIN xy0 y ON y.event_type = 'view' AND y.t = a.t
)
"""


def spearman_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily purchase- and
    view-cents series — the monotone-association reading that Pearson
    (``corr_battery``) misses when the relationship is nonlinear.
    Computed by the classic rank-difference identity
    ρ = 1 − 6·Σd²/(n·(n²−1)) over ranks from the (value, t) total
    order — defined EXACTLY (the tie-broken rank permutation makes the
    formula a precise statistic, not the ties-approximation), and every
    quantity up to the final division is an exact integer: no float
    sums at all.

    Scale: everything after the day-grain aggregate is calendar-bounded
    metadata; ranks come from window sorts over the ~n_days rows.
    """
    xy = _daily_xy(spark, sf_dir)
    wx = Window.orderBy("x", "t")
    wy = Window.orderBy("y", "t")
    ranked = xy.select(
        "t",
        F.row_number().over(wx).cast("bigint").alias("rx"),
        F.row_number().over(wy).cast("bigint").alias("ry"),
    )
    d38 = "decimal(38,0)"
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            ((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))).cast(
                d38
            )
        ).alias("__sd2"),
    )
    n = F.col("n_days").cast(d38)
    rho = F.lit(1.0) - (
        (F.lit(6).cast(d38) * F.col("__sd2")).cast("double")
        / (n * (n * n - 1)).cast("double")
    )
    return agg.select(
        "n_days",
        F.col("__sd2").cast("bigint").alias("sum_d2"),
        F.round(rho, 6).alias("spearman_rho"),
    )


SPEARMAN_SQL = f"""
WITH {_DAILY_XY_SQL}, ranked AS (
  SELECT t,
    ROW_NUMBER() OVER (ORDER BY x, t)::BIGINT AS rx,
    ROW_NUMBER() OVER (ORDER BY y, t)::BIGINT AS ry
  FROM series
), agg AS (
  SELECT COUNT(*)::BIGINT AS n_days,
    SUM(((rx - ry) * (rx - ry))::DECIMAL(38,0)) AS sd2
  FROM ranked
)
SELECT n_days, sd2::BIGINT AS sum_d2,
  ROUND(1.0 - (6::DECIMAL(38,0) * sd2)::DOUBLE
        / (n_days::DECIMAL(38,0) * (n_days::DECIMAL(38,0) * n_days::DECIMAL(38,0) - 1))::DOUBLE,
        6) AS spearman_rho
FROM agg
"""


def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between the daily purchase- and view-cents series:
    concordant/discordant day pairs with the standard tie corrections,
    τ_b = (C−D)/√((n₀−t_x)·(n₀−t_y)) — the pair-counting companion to
    :func:`spearman_purchase_view` (τ has a direct probabilistic
    reading: P(concordant) − P(discordant)).

    Determinism: C, D, and all tie counts are EXACT integers from the
    O(days²) pair expansion (calendar-bounded after the day-grain
    collapse, the Theil–Sen/Mann–Kendall playbook); τ is one double
    division over one portable √.
    """
    xy = _daily_xy(spark, sf_dir)
    a, b = xy.alias("a"), xy.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.t") < F.col("b.t"))
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.when((dx > 0) & (dy > 0) | (dx < 0) & (dy < 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("concordant"),
        F.sum(
            F.when((dx > 0) & (dy < 0) | (dx < 0) & (dy > 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("discordant"),
        F.sum(F.when((dx == 0) & (dy != 0), 1).otherwise(0))
        .cast("bigint")
        .alias("__tx"),
        F.sum(F.when((dy == 0) & (dx != 0), 1).otherwise(0))
        .cast("bigint")
        .alias("__ty"),
        F.sum(F.when((dx == 0) & (dy == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("__txy"),
    )
    n0 = F.col("n_pairs").cast("double")
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.sqrt(
        (n0 - (F.col("__tx") + F.col("__txy")).cast("double"))
        * (n0 - (F.col("__ty") + F.col("__txy")).cast("double"))
    )
    return agg.select(
        "n_pairs",
        "concordant",
        "discordant",
        F.round(tau, 6).alias("kendall_tau_b"),
    )


KENDALL_SQL = f"""
WITH {_DAILY_XY_SQL}, agg AS (
  SELECT COUNT(*)::BIGINT AS n_pairs,
    SUM(CASE WHEN (b.x - a.x > 0 AND b.y - a.y > 0)
              OR (b.x - a.x < 0 AND b.y - a.y < 0) THEN 1 ELSE 0 END)::BIGINT
      AS concordant,
    SUM(CASE WHEN (b.x - a.x > 0 AND b.y - a.y < 0)
              OR (b.x - a.x < 0 AND b.y - a.y > 0) THEN 1 ELSE 0 END)::BIGINT
      AS discordant,
    SUM(CASE WHEN b.x - a.x = 0 AND b.y - a.y != 0 THEN 1 ELSE 0 END)::BIGINT AS tx,
    SUM(CASE WHEN b.y - a.y = 0 AND b.x - a.x != 0 THEN 1 ELSE 0 END)::BIGINT AS ty,
    SUM(CASE WHEN b.x - a.x = 0 AND b.y - a.y = 0 THEN 1 ELSE 0 END)::BIGINT AS txy
  FROM series a JOIN series b ON a.t < b.t
)
SELECT n_pairs, concordant, discordant,
  ROUND((concordant - discordant)::DOUBLE
        / sqrt((n_pairs::DOUBLE - (tx + txy)::DOUBLE)
               * (n_pairs::DOUBLE - (ty + txy)::DOUBLE)), 6) AS kendall_tau_b
FROM agg
"""


def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over event values — the canonical time-series
    downsampling (open/high/low/close per day) every monitoring and
    market-data surface emits. Open/close are selected by
    ``max_by``/``min_by`` over the within-day event rank from
    ``grouped_row_index`` (group = day): ranking inside a day through
    the two-phase bucketed numbering means a HOT day (a flash sale, a
    retrain burst) never lands in one window task — the failure mode of
    ``row_number() OVER (PARTITION BY day)`` when days are few and
    huge.

    Determinism: the within-day order is the (ts, event_id) total
    order; rank is unique within a day, so ``max_by(cents, rn)`` /
    DuckDB ``arg_max`` pick identical rows; high/low/counts are plain
    aggregates on exact cents.
    """
    return ohlc_over(load_table(spark, sf_dir, "events"))


def ohlc_over(events: DataFrame) -> DataFrame:
    """Frame-level core of :func:`ohlc_daily_bars` — also the batch twin
    the streaming fold (streaming/stateful.py::ohlc_stream, O(1) state
    per day) must reproduce bit-for-bit
    (tests/test_stateful_ohlc.py)."""
    from ..operators.layout import grouped_row_index

    ev = events.select(
        F.to_date("ts").alias("day"),
        F.unix_timestamp("ts").alias("at"),
        "event_id",
        _cents().alias("cents"),
    )
    ranked = grouped_row_index(
        ev, group="day", key="at", tiebreak=("event_id",), index_col="rn"
    )
    return ranked.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("min_by(cents, rn)").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.expr("max_by(cents, rn)").alias("close_cents"),
    )


OHLC_SQL = """
WITH ev AS (
  SELECT ts::DATE AS day, FLOOR(epoch(ts))::BIGINT AS at, event_id,
         (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS cents
  FROM events
), ranked AS (
  SELECT day, cents,
    ROW_NUMBER() OVER (PARTITION BY day ORDER BY at, event_id) AS rn
  FROM ev
)
SELECT day, COUNT(*)::BIGINT AS n_events,
  arg_min(cents, rn) AS open_cents,
  MAX(cents) AS high_cents,
  MIN(cents) AS low_cents,
  arg_max(cents, rn) AS close_cents
FROM ranked GROUP BY day
"""


def anomaly_days_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted daily anomaly flags: remove the day-of-week
    mean (the `seasonal_decompose_weekly` seasonal term) from the daily
    revenue series and flag days whose residual exceeds 3 population
    sigmas — THE on-call question ("was Tuesday actually bad, or is
    Tuesday always bad?") asked after every revenue dip. One row per
    day with its residual and flag.

    Determinism: day totals are exact cents; dow means are one double
    division each; residuals are a fixed 2-op chain; the residual
    moment sums ride DECIMAL(20,8) (order-independent); σ is one
    portable √; dow parity is the Spark ``dayofweek`` ≡ DuckDB
    ``dayofweek + 1`` convention.

    Scale: one day-grain aggregate is the only full pass; dow stats
    (7 rows) broadcast back onto the calendar-bounded day frame.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(F.to_date("ts").alias("day"), _cents().alias("cents"))
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("c"))
        .withColumn("dow", F.dayofweek("day"))
    )
    dow_stats = days.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nd"),
        F.sum("c").cast("bigint").alias("__sd"),
    )
    resid = days.join(F.broadcast(dow_stats), "dow").withColumn(
        "__r",
        F.col("c").cast("double")
        - F.col("__sd").cast("double") / F.col("__nd").cast("double"),
    )
    d20 = "decimal(20,8)"
    mom = resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.col("__r").cast(d20)).cast("double").alias("__s"),
        F.sum((F.col("__r") * F.col("__r")).cast(d20))
        .cast("double")
        .alias("__q"),
    )
    nn = F.col("__n").cast("double")
    sigma = F.sqrt((nn * F.col("__q") - F.col("__s") * F.col("__s"))) / nn
    return (
        resid.join(F.broadcast(mom))
        .select(
            "day",
            "dow",
            F.col("c").alias("day_cents"),
            F.round("__r", 6).alias("residual_cents"),
            (F.abs(F.col("__r")) > F.lit(3.0) * sigma).alias("is_anomaly"),
        )
    )


ANOMALY_DAYS_SQL = """
WITH days AS (
  SELECT ts::DATE AS day,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1
), dayd AS (
  SELECT day, c, dayofweek(day) + 1 AS dow FROM days
), dow_stats AS (
  SELECT dow, COUNT(*)::BIGINT AS nd, SUM(c)::BIGINT AS sd
  FROM dayd GROUP BY dow
), resid AS (
  SELECT day, dow, c, c::DOUBLE - sd::DOUBLE / nd::DOUBLE AS r
  FROM dayd JOIN dow_stats USING (dow)
), mom AS (
  SELECT COUNT(*)::BIGINT AS n,
    CAST(CAST(SUM(CAST(r AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS s,
    CAST(CAST(SUM(CAST(r * r AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS q
  FROM resid
)
SELECT day, dow, c AS day_cents, ROUND(r, 6) AS residual_cents,
  abs(r) > 3.0 * (sqrt(n::DOUBLE * q - s * s) / n::DOUBLE) AS is_anomaly
FROM resid CROSS JOIN mom
"""


_BACKTEST_DAYS = 14


def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the two baselines every forecast must
    beat — naive (ŷₜ = yₜ₋₁) and seasonal-naive (ŷₜ = yₜ₋₇) — over the
    last 14 days of the zero-filled dense daily revenue series,
    reporting MAPE and RMSE per model. The honest yardstick for
    ``holt_linear_trend``/``seasonal_decompose_weekly``: a model that
    can't beat seasonal-naive is noise.

    Determinism: the dense axis makes lags pure integer index joins;
    errors are exact BIGINTs; the |e|/y and e² terms ride DECIMAL(20,8)
    (order-independent); MAPE and RMSE are one division (+ one portable
    √) each. Zero-revenue actuals are excluded from MAPE (undefined)
    but kept in RMSE — the standard convention, applied identically in
    both engines.

    Scale: one day-grain aggregate; the axis, lag joins and the 2-row
    summary are calendar-bounded metadata.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(F.to_date("ts").alias("day"), _cents().alias("cents"))
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("c"))
    )
    bounds = days.agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
    axis = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("__d1"), F.col("__d0")))
        ).alias("t"),
        "__d0",
    ).select("t", F.date_add(F.col("__d0"), F.col("t")).alias("day"))
    dense = axis.join(days, "day", "left").select(
        "t", F.coalesce("c", F.lit(0)).cast("bigint").alias("y")
    )
    tmax = dense.agg(F.max("t").alias("__tmax"))
    base = dense.join(F.broadcast(tmax)).filter(
        F.col("t") > F.col("__tmax") - _BACKTEST_DAYS
    )
    preds = None
    for model, lag in (("naive", 1), ("seasonal_naive", 7)):
        p = base.join(
            F.broadcast(
                dense.select(
                    (F.col("t") + lag).alias("t"), F.col("y").alias("yhat")
                )
            ),
            "t",
        ).select(F.lit(model).alias("model"), "y", "yhat")
        preds = p if preds is None else preds.unionByName(p)
    d20 = "decimal(20,8)"
    err = (F.col("y") - F.col("yhat")).cast("double")
    agg = preds.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum(
                F.when(
                    F.col("y") != 0,
                    (F.abs(err) / F.col("y").cast("double")).cast(d20),
                )
            ).cast("double")
            / F.sum(F.when(F.col("y") != 0, 1).otherwise(0)).cast("double"),
            6,
        ).alias("mape"),
        F.round(
            F.sqrt(
                F.sum((err * err).cast(d20)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ),
            6,
        ).alias("rmse_cents"),
    )
    return agg


FORECAST_BACKTEST_SQL = f"""
WITH days AS (
  SELECT ts::DATE AS day,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1
), bounds AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM days
), axis AS (
  SELECT unnest(range(0, date_diff('day', d0, d1) + 1))::BIGINT AS t, d0
  FROM bounds
), dense AS (
  SELECT a.t, COALESCE(d.c, 0)::BIGINT AS y
  FROM axis a LEFT JOIN (
    SELECT date_diff('day', d0, day)::BIGINT AS t, c
    FROM days CROSS JOIN bounds
  ) d ON d.t = a.t
), tmax AS (
  SELECT MAX(t) AS tm FROM dense
), preds AS (
  SELECT 'naive' AS model, b.y, p.y AS yhat
  FROM dense b CROSS JOIN tmax JOIN dense p ON p.t = b.t - 1
  WHERE b.t > tm - {_BACKTEST_DAYS}
  UNION ALL
  SELECT 'seasonal_naive' AS model, b.y, p.y AS yhat
  FROM dense b CROSS JOIN tmax JOIN dense p ON p.t = b.t - 7
  WHERE b.t > tm - {_BACKTEST_DAYS}
)
SELECT model, COUNT(*)::BIGINT AS n_days,
  ROUND(CAST(CAST(SUM(CASE WHEN y != 0
               THEN CAST(abs((y - yhat)::DOUBLE) / y::DOUBLE AS DECIMAL(20,8))
               END) AS VARCHAR) AS DOUBLE)
        / SUM(CASE WHEN y != 0 THEN 1 ELSE 0 END)::DOUBLE, 6) AS mape,
  ROUND(sqrt(CAST(CAST(SUM(CAST((y - yhat)::DOUBLE * (y - yhat)::DOUBLE
                   AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
             / COUNT(*)::DOUBLE), 6) AS rmse_cents
FROM preds GROUP BY model
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register(
        "forecast_backtest_naive", forecast_backtest_naive, FORECAST_BACKTEST_SQL
    )
    register("anomaly_days_seasonal", anomaly_days_seasonal, ANOMALY_DAYS_SQL)
    register("ohlc_daily_bars", ohlc_daily_bars, OHLC_SQL)
    register("acf_daily_cents", acf_daily_cents, ACF_DAILY_SQL)
    register("ccf_purchase_view_daily", ccf_purchase_view_daily, CCF_SQL)
    register("durbin_watson_daily", durbin_watson_daily, DURBIN_WATSON_SQL)
    register(
        "spearman_purchase_view", spearman_purchase_view, SPEARMAN_SQL
    )
    register("kendall_tau_daily", kendall_tau_daily, KENDALL_SQL)
    register("gapfill_linear_interp", gapfill_linear_interp, GAPFILL_SQL)
    register("holt_linear_trend", holt_linear_trend, _holt_sql())
    register(
        "seasonal_decompose_weekly",
        seasonal_decompose_weekly,
        SEASONAL_DECOMP_SQL,
    )
