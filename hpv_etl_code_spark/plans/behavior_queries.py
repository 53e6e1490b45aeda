"""Behavioral-analytics entries: funnel conversion and cohort
retention — the two queries every event-warehouse dashboard runs.

Both reduce the events fact to per-user aggregates in ONE hash
aggregation (min event time per stage, conditional on type), then do
metadata-scale arithmetic on top. No window over the raw fact, no
self-joins — the shapes that survive a 100 TB event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week — the engagement ratio product
    teams track (avg daily actives ÷ weekly actives; 1.0 = every
    weekly user active every day).

    Two grouped distinct counts (day grain, week grain) + one
    metadata-sized join on the week key. ``date_trunc('week')`` is ISO
    Monday in both engines; the ratio divides an exact integer sum by
    exact integer counts, rounded to 6dp."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("wk"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    dau = ev.groupBy("wk", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = ev.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    weekly_dau = dau.groupBy("wk").agg(
        F.sum("dau").alias("dau_sum"), F.count(F.lit(1)).alias("n_days")
    )
    return (
        weekly_dau.join(wau, "wk")
        .select(
            F.col("wk").cast("date").alias("week"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau_sum") / F.col("n_days"), 6).alias("avg_dau"),
            F.round(
                F.col("dau_sum") / F.col("n_days") / F.col("wau"), 6
            ).alias("stickiness"),
        )
    )


DAU_WAU_SQL = """
WITH base AS (
  SELECT user_id, date_trunc('week', ts) AS wk, date_trunc('day', ts) AS day
  FROM events
), dau AS (
  SELECT wk, day, COUNT(DISTINCT user_id) AS dau FROM base GROUP BY 1, 2
), wau AS (
  SELECT wk, COUNT(DISTINCT user_id)::BIGINT AS wau FROM base GROUP BY 1
), wd AS (
  SELECT wk, SUM(dau) AS dau_sum, COUNT(*) AS n_days FROM dau GROUP BY 1
)
SELECT wd.wk::DATE AS week, wau,
       round(dau_sum::DOUBLE / n_days, 6) AS avg_dau,
       round(dau_sum::DOUBLE / n_days / wau, 6) AS stickiness
FROM wd JOIN wau USING (wk)
"""


JOURNEY_STEPS = 3


def user_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis: each user's first three events (by
    time, event_id tiebreak) joined into a 'view>click>purchase'-style
    path string, then the user count per distinct path — the entry
    point of product-analytics journey/sankey reports.

    Plan shape: the per-user rank filter compiles to WindowGroupLimit
    (per-partition top-k pruning BEFORE the shuffle completes — only
    ≤ 3 rows per user survive), the ordered path assembly is
    ``sort_array(collect_list(struct(...)))`` on the same user_id
    clustering (deterministic ordered aggregation — plain collect_list
    order is not defined), and the final per-path count is one more
    metadata-sized aggregation. Nothing touches the event payload.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("at"),
        "event_id",
        "event_type",
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy("at", "event_id")
    )
    first_n = ev.withColumn("rk", rk).filter(F.col("rk") <= JOURNEY_STEPS)
    paths = first_n.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rk", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


USER_JOURNEY_SQL = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY FLOOR(epoch(ts))::BIGINT, event_id) AS rk
  FROM events
), p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rk) AS path
  FROM ranked WHERE rk <= {JOURNEY_STEPS} GROUP BY 1
)
SELECT path, COUNT(*)::BIGINT AS n_users FROM p GROUP BY 1
"""


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


def conversion_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users whose first purchase
    follows their first view, the median/p90/max view→purchase lag in
    seconds. Same single first-touch aggregation as the funnel; the
    percentile runs over one row per converted user."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    lag_s = (
        F.unix_micros("t_purchase") - F.unix_micros("t_view")
    ).cast("double") / 1e6
    converted = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_view"))
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.median(lag_s), 6).alias("p50_lag_s"),
        F.round(F.expr(
            "percentile((unix_micros(t_purchase) - unix_micros(t_view)) / 1e6,"
            " 0.9)"
        ), 6).alias("p90_lag_s"),
        F.round(F.max(lag_s), 6).alias("max_lag_s"),
    )


CONVERSION_LAG_SQL = """
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
), converted AS (
  SELECT epoch_us(t_purchase - t_view) / 1e6 AS lag_s
  FROM firsts
  WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL
    AND t_purchase >= t_view
)
SELECT COUNT(*) AS n_converted,
  round(median(lag_s), 6) AS p50_lag_s,
  round(quantile_cont(lag_s, 0.9), 6) AS p90_lag_s,
  round(max(lag_s), 6) AS max_lag_s
FROM converted
"""


def weekly_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change per event type: weekly counts (one hash
    aggregation over the fact), then lag arithmetic over the tiny
    (type, week) aggregate — windows run on metadata, never the raw
    log."""
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return weekly.select(
        "week",
        "event_type",
        "n",
        F.round((F.col("n") - prev) * 100.0 / prev, 6).alias("pct_change"),
    )


WEEKLY_MOVERS_SQL = """
WITH weekly AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week, event_type,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT week, event_type, n,
  round((n - LAG(n) OVER w) * 100.0 / LAG(n) OVER w, 6) AS pct_change
FROM weekly
WINDOW w AS (PARTITION BY event_type ORDER BY week)
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between event types: per user,
    order events by time and count (previous → current) pairs; emit the
    row-normalized transition probability. One keyed lag window over
    the fact plus two metadata-scale aggregations — the flow-analysis
    query behind every product journey sankey."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(totals), 6).alias("p"),
    )


TRANSITION_SQL = """
WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), counted AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
  round(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM counted
"""


# ------------------------------------------------ touch attribution

_ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback, microseconds


def touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch conversion attribution: every
    purchase credits the earliest / latest non-purchase event of the
    same user inside the preceding 7 days (exclusive of the purchase
    instant); purchases with no touch in window report as channel
    '(none)'. Output: (channel, model, n_conversions, share).

    Determinism: candidate touches come from a BANDED range join
    (band = ts_us DIV window; a 7-day lookback spans exactly bands
    {b−1, b} — the 2-band trick from operators/rangejoin.py), and the
    per-purchase first/last selection uses min_by/max_by keyed on the
    FULL (ts_us, event_id) struct, so timestamp ties cannot flip the
    answer in either engine (a window RANGE frame with first/last would
    leave same-microsecond ordering unspecified — the hazard this
    formulation removes).

    Scale: one banded equi-join (purchases replicated ×2 on band keys,
    never a cross join), one per-purchase min_by/max_by aggregation,
    and a channel-sized rollup. Join fan-out is bounded by per-user
    events-per-window — the natural density of the log.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("us").alias("p_us"),
        F.expr(f"us DIV {_ATTR_WINDOW_US}").alias("band"),
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
        F.col("us").alias("t_us"),
        F.expr(f"us DIV {_ATTR_WINDOW_US}").alias("t_band"),
    )
    p2 = purchases.withColumn(
        "probe", F.explode(F.array(F.col("band") - 1, F.col("band")))
    )
    joined = p2.join(
        touches,
        (p2.user_id == touches.user_id)
        & (p2.probe == touches.t_band)
        & (touches.t_us >= p2.p_us - _ATTR_WINDOW_US)
        & (touches.t_us < p2.p_us),
    )
    credits = joined.groupBy("p_id").agg(
        F.min_by(
            F.col("t_type"), F.struct(F.col("t_us"), F.col("t_id"))
        ).alias("first_channel"),
        F.max_by(
            F.col("t_type"), F.struct(F.col("t_us"), F.col("t_id"))
        ).alias("last_channel"),
    )
    attributed = purchases.join(credits, "p_id", "left").select(
        "p_id",
        F.coalesce("first_channel", F.lit("(none)")).alias("first"),
        F.coalesce("last_channel", F.lit("(none)")).alias("last"),
    )
    totals = purchases.agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
    models = attributed.select(
        F.explode(
            F.array(
                F.struct(F.lit("first").alias("model"), F.col("first").alias("channel")),
                F.struct(F.lit("last").alias("model"), F.col("last").alias("channel")),
            )
        ).alias("mc")
    ).select("mc.model", "mc.channel")
    return (
        models.groupBy("channel", "model")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
        .join(F.broadcast(totals))
        .select(
            "channel",
            "model",
            "n_conversions",
            F.round(
                F.col("n_conversions").cast("double")
                / F.col("__t").cast("double"),
                6,
            ).alias("share"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts)::BIGINT AS us
  FROM events
), p AS (
  SELECT user_id, event_id AS p_id, us AS p_us FROM ev
  WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, event_id AS t_id, event_type AS t_type, us AS t_us
  FROM ev WHERE event_type <> 'purchase'
), joined AS (
  SELECT p.p_id, t.t_type, t.t_us, t.t_id
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_us >= p.p_us - {_ATTR_WINDOW_US} AND t.t_us < p.p_us
), ranked AS (
  SELECT p_id, t_type,
    row_number() OVER (PARTITION BY p_id ORDER BY t_us ASC, t_id ASC) AS rf,
    row_number() OVER (PARTITION BY p_id ORDER BY t_us DESC, t_id DESC) AS rl
  FROM joined
), credits AS (
  SELECT p_id,
    MAX(CASE WHEN rf = 1 THEN t_type END) AS first_channel,
    MAX(CASE WHEN rl = 1 THEN t_type END) AS last_channel
  FROM ranked GROUP BY 1
), attributed AS (
  SELECT p.p_id,
    COALESCE(first_channel, '(none)') AS f,
    COALESCE(last_channel, '(none)') AS l
  FROM p LEFT JOIN credits ON p.p_id = credits.p_id
), models AS (
  SELECT 'first' AS model, f AS channel FROM attributed
  UNION ALL
  SELECT 'last', l FROM attributed
)
SELECT channel, model, COUNT(*)::BIGINT AS n_conversions,
  ROUND(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM p)::DOUBLE, 6) AS share
FROM models GROUP BY 1, 2
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    the orders fact: per-customer days-since-last-order, order count and
    total cents, each cut into quintiles, then segment-level counts and
    average monetary value — the classic CRM scoring grid (≤125 rows).

    Quintiles are computed from an EXPLICIT dense rank — bucket =
    ((i−1)·5) DIV n + 1 — so ntile()'s front-loaded-remainder semantics
    never enter: the same integer formula runs in both engines and
    bucket membership is bit-identical. The three ranks come from ONE
    pass: the customer frame is unpivoted to (custkey, metric, value)
    and ``grouped_row_index`` (operators/layout.py) ranks all three
    metrics simultaneously — per-metric range bucketing, parallel
    within-bucket numbering, metadata-sized offsets; NO per-metric
    single-partition sort and no tripled plan. All averages are
    exact-integer sums with one final double division.

    Scale: one fact aggregate to customer grain, one 3n-row unpivot
    through the grouped two-phase numbering, one pivot-back aggregate
    keyed on custkey, one ≤125-group aggregate.
    """
    from ..operators.layout import grouped_row_index

    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("od"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max("od").alias("__last"),
            F.count(F.lit(1)).cast("bigint").alias("f"),
            F.sum("cents").cast("bigint").alias("m"),
        )
    )
    anchor = per_cust.agg(F.max("__last").alias("__d1"))
    base = per_cust.join(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.col("__d1"), F.col("__last")).cast("bigint").alias("r"),
        "f",
        "m",
    )
    unpivoted = base.select(
        "o_custkey",
        F.expr("stack(3, 'r', r, 'f', f, 'm', m) AS (metric, v)"),
    )
    ranked = grouped_row_index(
        unpivoted, group="metric", key="v", tiebreak=("o_custkey",), index_col="i"
    )
    pivoted = ranked.groupBy("o_custkey").agg(
        F.max(F.when(F.col("metric") == "r", F.col("i"))).alias("__ir"),
        F.max(F.when(F.col("metric") == "f", F.col("i"))).alias("__if"),
        F.max(F.when(F.col("metric") == "m", F.col("i"))).alias("__im"),
        F.max(F.when(F.col("metric") == "m", F.col("v"))).alias("m"),
    )
    n = pivoted.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    q = lambda i: F.expr(f"(({i} - 1) * 5) DIV __n + 1")  # noqa: E731
    return (
        pivoted.join(F.broadcast(n))
        .select(
            q("__ir").alias("r_q"),
            q("__if").alias("f_q"),
            q("__im").alias("m_q"),
            "m",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum("m").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_monetary_cents"),
        )
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey, MAX(o_orderdate::DATE) AS last_od,
         COUNT(*)::BIGINT AS f,
         SUM((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS m
  FROM orders GROUP BY o_custkey
), anchor AS (
  SELECT MAX(last_od) AS d1 FROM per_cust
), base AS (
  SELECT o_custkey, date_diff('day', last_od, d1)::BIGINT AS r, f, m
  FROM per_cust CROSS JOIN anchor
), ranked AS (
  SELECT m,
    ROW_NUMBER() OVER (ORDER BY r, o_custkey)::BIGINT AS ir,
    ROW_NUMBER() OVER (ORDER BY f, o_custkey)::BIGINT AS iq,
    ROW_NUMBER() OVER (ORDER BY m, o_custkey)::BIGINT AS im,
    COUNT(*) OVER ()::BIGINT AS n
  FROM base
)
SELECT ((ir - 1) * 5) // n + 1 AS r_q,
       ((iq - 1) * 5) // n + 1 AS f_q,
       ((im - 1) * 5) // n + 1 AS m_q,
       COUNT(*)::BIGINT AS n_customers,
       ROUND(SUM(m)::DOUBLE / COUNT(*)::DOUBLE, 6) AS avg_monetary_cents
FROM ranked GROUP BY 1, 2, 3
"""


def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy of the user event stream,
    H(next | current) = Σᵢⱼ (nᵢⱼ/N)·ln(nᵢ/nᵢⱼ) over the per-user
    (current → next) transition counts — the navigation-predictability
    number on top of ``event_transition_matrix``'s raw probabilities
    (low H = deterministic flows, high H = exploratory traffic; the
    sequence-modeling baseline any behavior model must beat). One row
    per current state (its outgoing-entropy term sum) plus the TOTAL
    conditional entropy (event_type 'TOTAL').

    Determinism: transition counts come from a (ts, event_id)-ordered
    lag per user; every ln() argument is a ratio of exact BIGINTs; the
    per-state and TOTAL sums ride DECIMAL(20,8)
    (partition-order-independent).

    Scale: ONE user_id exchange serves the ordering window; transitions
    collapse to a ≤|types|² cell grid; everything after is metadata.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    outs = pairs.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_out")
    )
    nn = pairs.agg(F.sum("n").cast("bigint").alias("__N"))
    terms = (
        pairs.join(F.broadcast(outs), "event_type")
        .join(F.broadcast(nn))
        .withColumn(
            "__term",
            (F.col("n").cast("double") / F.col("__N").cast("double"))
            * F.log(
                F.col("n_out").cast("double") / F.col("n").cast("double")
            ),
        )
    )
    per_state = terms.groupBy("event_type").agg(
        F.max("n_out").alias("n_out"),
        F.round(
            F.sum(F.col("__term").cast("decimal(20,8)")).cast("double"), 6
        ).alias("entropy_term"),
    )
    total = terms.agg(
        F.lit("TOTAL").alias("event_type"),
        F.sum("n").cast("bigint").alias("n_out"),
        F.round(
            F.sum(F.col("__term").cast("decimal(20,8)")).cast("double"), 6
        ).alias("entropy_term"),
    )
    return per_state.unionByName(total)


TRANSITION_ENTROPY_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
), pairs AS (
  SELECT event_type, next_type, COUNT(*)::BIGINT AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY 1, 2
), outs AS (
  SELECT event_type, SUM(n)::BIGINT AS n_out FROM pairs GROUP BY event_type
), nn AS (
  SELECT SUM(n)::BIGINT AS grand FROM pairs
), terms AS (
  SELECT p.event_type, p.n, o.n_out,
    (p.n::DOUBLE / grand::DOUBLE) * ln(o.n_out::DOUBLE / p.n::DOUBLE) AS term
  FROM pairs p JOIN outs o USING (event_type) CROSS JOIN nn
)
SELECT event_type, MAX(n_out)::BIGINT AS n_out,
  ROUND(CAST(CAST(SUM(CAST(term AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
    AS entropy_term
FROM terms GROUP BY event_type
UNION ALL
SELECT 'TOTAL' AS event_type, SUM(n)::BIGINT AS n_out,
  ROUND(CAST(CAST(SUM(CAST(term AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
    AS entropy_term
FROM terms
"""


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime-value curves by acquisition cohort: customers
    are cohorted by their FIRST order month, revenue is bucketed by
    cohort age in months, and each (cohort, age) cell reports the
    cohort's cumulative average revenue — the money companion to
    ``cohort_retention`` (retention says who comes back; LTV says what
    they're worth). Month arithmetic is the integer index
    year·12 + (month−1), so cohort and age are exact integers with no
    date-interval seam between engines.

    Determinism: revenue is exact cents; the cumulative sum runs in
    BIGINT over the (cohorts × ages ≤ months²) metadata grid; the
    average is one double division per cell, rounded 6dp.

    Scale: one customer-grain first-order aggregate joined back (the
    fact's second and last pass), one (cohort, age) aggregate, then
    metadata arithmetic.
    """
    orders = load_table(spark, sf_dir, "orders")
    midx = F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1)
    firsts = (
        orders.groupBy("o_custkey")
        .agg(F.min(midx).alias("cohort"))
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    cells = (
        orders.select(
            "o_custkey",
            midx.alias("__m"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .join(firsts, "o_custkey")
        .groupBy("cohort", (F.col("__m") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.withColumn("__cum", F.sum("rev").over(w).cast("bigint"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "n_customers",
            F.col("rev").alias("period_cents"),
            F.round(
                F.col("__cum").cast("double")
                / F.col("n_customers").cast("double"),
                6,
            ).alias("cum_avg_ltv_cents"),
        )
    )


COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS m,
         (CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT AS cents
  FROM orders
), firsts AS (
  SELECT o_custkey, MIN(m) AS cohort FROM o GROUP BY o_custkey
), sizes AS (
  SELECT cohort, COUNT(*)::BIGINT AS n_customers FROM firsts GROUP BY cohort
), cells AS (
  SELECT f.cohort, o.m - f.cohort AS age, SUM(o.cents)::BIGINT AS rev
  FROM o JOIN firsts f USING (o_custkey)
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, age, rev,
    SUM(rev) OVER (PARTITION BY cohort ORDER BY age
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS c
  FROM cells
)
SELECT cohort, age, n_customers, rev AS period_cents,
  ROUND(c::DOUBLE / n_customers::DOUBLE, 6) AS cum_avg_ltv_cents
FROM cum JOIN sizes USING (cohort)
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("funnel_conversion", funnel_conversion, FUNNEL_SQL)
    register("transition_entropy", transition_entropy, TRANSITION_ENTROPY_SQL)
    register("cohort_ltv_curves", cohort_ltv_curves, COHORT_LTV_SQL)
    register("rfm_segments", rfm_segments, RFM_SQL)
    register("touch_attribution", touch_attribution, ATTRIBUTION_SQL)
    register("user_journey_paths", user_journey_paths, USER_JOURNEY_SQL)
    register("dau_wau_stickiness", dau_wau_stickiness, DAU_WAU_SQL)
    register("cohort_retention", cohort_retention, COHORT_SQL)
    register("conversion_lag_stats", conversion_lag_stats, CONVERSION_LAG_SQL)
    register("weekly_top_movers", weekly_top_movers, WEEKLY_MOVERS_SQL)
    register("event_transition_matrix", event_transition_matrix, TRANSITION_SQL)
