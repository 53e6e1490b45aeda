"""Robust statistics & distributional diagnostics (round 5, session 5):
Theil–Sen robust trend, A/B power analysis (minimum detectable effect),
Jensen–Shannon drift divergence, Gini revenue concentration and
inter-arrival burstiness. The reference pipeline
(``/root/reference/src/main.py:1-141``) has no statistics surface; these
extend the north-star experimentation/monitoring kit next to
``srm_assignment_check``/``cuped_variance_reduction``
(inference_queries.py) and ``psi_value_drift`` (olap_queries.py).

Determinism contract (the repo-wide playbook): money rides exact cents
(DECIMAL(12,2)·100 → BIGINT), every variance/covariance numerator is the
÷n-free integer form (n·Σx² − S², exact in BIGINT/DECIMAL), medians are
rank-selected (never interpolated across engines), and each output
double is a short fixed-order IEEE chain rounded to 6dp — identical in
the DuckDB twins. Float SUMs that cross a shuffle go through
DECIMAL(20,8) so they are partition-order-independent (the
``psi_value_drift`` trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.layout import global_row_index
from ..sources.registry import load_table


def _cents(col: str = "value"):  # noqa: ANN202
    return (F.col(col).cast("decimal(12,2)") * 100).cast("bigint")


# ---------------------------------------------------------------------------
# Theil–Sen robust trend of the daily revenue series
# ---------------------------------------------------------------------------


def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily total-cents trend: the median of
    all pairwise slopes (cⱼ−cᵢ)/(dⱼ−dᵢ) over the day-grained series,
    plus the matching median intercept (median over days of
    cᵢ − slope·dᵢ). Robust to up to ~29% outlier days where the OLS
    twin (``ols_segment_trend``) is not.

    Determinism: slopes are ONE double division of two exact BIGINTs;
    the median is rank-selected — sort by slope value, take ranks
    ⌈m/2⌉ and ⌊m/2⌋+1 and average (equal-value ties make the pick
    value-stable regardless of tie order); the intercept chain is
    cᵢ − slope·dᵢ (two IEEE ops) then the same rank-median.

    Scale: the fact table collapses to ONE day-grained aggregate
    (calendar-bounded: ≤ a few thousand rows for years of data), so the
    O(days²) pair expansion is metadata-sized work on a broadcast
    self-join — input volume only ever touches the first aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(F.to_date("ts").alias("day"), _cents().alias("cents"))
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("c"))
    )
    d0 = days.agg(F.min("day").alias("__d0"))
    xs = days.join(F.broadcast(d0)).select(
        F.datediff(F.col("day"), F.col("__d0")).cast("bigint").alias("x"), "c"
    )
    a, b = xs.alias("a"), xs.alias("b")
    slopes = (
        a.join(F.broadcast(b), F.col("a.x") < F.col("b.x"))
        .select(
            (
                (F.col("b.c") - F.col("a.c")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("slope")
        )
    )
    from ..operators.layout import global_row_index

    m = slopes.agg(F.count(F.lit(1)).cast("bigint").alias("__m"))
    # two-phase rank, not row_number() OVER (ORDER BY slope): the pair
    # set is O(days²) — metadata-sized relative to the fact, but at a
    # decade of days it is millions of rows, too many for ONE window
    # task. Equal slope values are interchangeable for a value-selected
    # median, so no tiebreak column is needed for determinism.
    ranked = global_row_index(slopes, key="slope", index_col="__r").join(
        F.broadcast(m)
    )
    med_slope = (
        ranked.filter(
            (F.col("__r") == F.expr("(__m + 1) DIV 2"))
            | (F.col("__r") == F.expr("__m DIV 2 + 1"))
        )
        .agg(
            (F.sum("slope") / F.count(F.lit(1))).alias("slope_med"),
            F.max("__m").alias("n_pairs"),
        )
    )
    resid = xs.join(F.broadcast(med_slope)).select(
        (
            F.col("c").cast("double")
            - F.col("slope_med") * F.col("x").cast("double")
        ).alias("ic"),
        "slope_med",
        "n_pairs",
    )
    nd = resid.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    r2 = global_row_index(resid, key="ic", index_col="__r").join(
        F.broadcast(nd)
    )
    return (
        r2.filter(
            (F.col("__r") == F.expr("(__n + 1) DIV 2"))
            | (F.col("__r") == F.expr("__n DIV 2 + 1"))
        )
        .agg(
            F.max("__n").alias("n_days"),
            F.max("n_pairs").alias("n_pairs"),
            F.round(F.max("slope_med"), 6).alias("slope_cents_per_day"),
            F.round(F.sum("ic") / F.count(F.lit(1)), 6).alias(
                "intercept_cents"
            ),
        )
    )


THEIL_SEN_SQL = """
WITH days AS (
  SELECT ts::DATE AS day,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1
), d0 AS (
  SELECT MIN(day) AS d0 FROM days
), xs AS (
  SELECT date_diff('day', d0, day)::BIGINT AS x, c FROM days CROSS JOIN d0
), slopes AS (
  SELECT (b.c - a.c)::DOUBLE / (b.x - a.x)::DOUBLE AS slope
  FROM xs a JOIN xs b ON a.x < b.x
), m AS (
  SELECT COUNT(*)::BIGINT AS m FROM slopes
), ranked AS (
  SELECT slope, m, ROW_NUMBER() OVER (ORDER BY slope) AS r
  FROM slopes CROSS JOIN m
), med AS (
  SELECT SUM(slope) / COUNT(*) AS slope_med, MAX(m) AS n_pairs
  FROM ranked WHERE r = (m + 1) // 2 OR r = m // 2 + 1
), resid AS (
  SELECT c::DOUBLE - slope_med * x::DOUBLE AS ic, slope_med, n_pairs
  FROM xs CROSS JOIN med
), nd AS (
  SELECT COUNT(*)::BIGINT AS n FROM resid
), r2 AS (
  SELECT ic, slope_med, n_pairs, n, ROW_NUMBER() OVER (ORDER BY ic) AS r
  FROM resid CROSS JOIN nd
)
SELECT MAX(n) AS n_days, MAX(n_pairs) AS n_pairs,
  ROUND(MAX(slope_med), 6) AS slope_cents_per_day,
  ROUND(SUM(ic) / COUNT(*), 6) AS intercept_cents
FROM r2 WHERE r = (n + 1) // 2 OR r = n // 2 + 1
"""


# ---------------------------------------------------------------------------
# A/B power analysis — minimum detectable effect at α=0.05, power=0.8
# ---------------------------------------------------------------------------

_Z_ALPHA2 = 1.959964  # Φ⁻¹(0.975)
_Z_BETA = 0.841621  # Φ⁻¹(0.80)


def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the md5-assigned experiment (same
    arms as ``srm_assignment_check``): per-arm user-level total cents
    give pooled variance, and
    MDE = (z_{α/2}+z_β)·√(s²ₚ·(1/n₀+1/n₁)) — the smallest true lift the
    current traffic can detect at α=0.05 / 80% power. Completes the
    experimentation kit (SRM → power → Welch readout → CUPED → DiD).

    Determinism: per-arm n·Σx²−S² stays exact in DECIMAL(38,0);
    (n−1)·s² = varn/n is one double division per arm; s²ₚ, the MDE and
    the relative MDE are a short fixed-order IEEE chain (√ is correctly
    rounded and portable).

    Scale: one user-level aggregate (the only full pass) and one 2-arm
    aggregate — no joins at all.
    """
    ev = load_table(spark, sf_dir, "events")
    arm_of = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 2
    )
    per_user = (
        ev.select("user_id", _cents().alias("cents"))
        .groupBy("user_id")
        .agg(F.sum("cents").cast("bigint").alias("x"))
        .select(arm_of.alias("arm"), "x")
    )
    d38 = "decimal(38,0)"
    agg = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(
            F.when(
                F.col("arm") == 0,
                F.col("x").cast(d38) * F.col("x").cast(d38),
            ).otherwise(F.lit(0).cast(d38))
        ).alias("q0"),
        F.sum(
            F.when(
                F.col("arm") == 1,
                F.col("x").cast(d38) * F.col("x").cast(d38),
            ).otherwise(F.lit(0).cast(d38))
        ).alias("q1"),
    )
    # (nᵢ−1)·s²ᵢ = varnᵢ/nᵢ with varnᵢ = nᵢ·Σx²−S² exact — s²ₚ is the
    # two-division fixed-order form shared with the DuckDB twin
    varn0 = (
        F.col("n0").cast(d38) * F.col("q0")
        - F.col("s0").cast(d38) * F.col("s0").cast(d38)
    ).cast("double")
    varn1 = (
        F.col("n1").cast(d38) * F.col("q1")
        - F.col("s1").cast(d38) * F.col("s1").cast(d38)
    ).cast("double")
    s2p = (
        varn0 / F.col("n0").cast("double") + varn1 / F.col("n1").cast("double")
    ) / (F.col("n0") + F.col("n1") - 2).cast("double")
    mean0 = F.col("s0").cast("double") / F.col("n0").cast("double")
    mde = F.lit(_Z_ALPHA2 + _Z_BETA) * F.sqrt(
        s2p
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return agg.select(
        "n0",
        "n1",
        F.round(mean0, 6).alias("mean_ctrl_cents"),
        F.round(F.sqrt(s2p), 6).alias("sd_pooled"),
        F.round(mde, 6).alias("mde_cents"),
        F.round(mde / mean0 * F.lit(100.0), 6).alias("mde_pct_of_ctrl"),
    )


AB_POWER_SQL = f"""
WITH per_user AS (
  SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS x
  FROM events GROUP BY user_id
), agg AS (
  SELECT
    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
    SUM(CASE WHEN arm = 0 THEN x ELSE 0 END)::BIGINT AS s0,
    SUM(CASE WHEN arm = 1 THEN x ELSE 0 END)::BIGINT AS s1,
    SUM(CASE WHEN arm = 0 THEN x::DECIMAL(38,0) * x::DECIMAL(38,0)
        ELSE 0::DECIMAL(38,0) END) AS q0,
    SUM(CASE WHEN arm = 1 THEN x::DECIMAL(38,0) * x::DECIMAL(38,0)
        ELSE 0::DECIMAL(38,0) END) AS q1
  FROM per_user
), terms AS (
  SELECT n0, n1, s0,
    ((n0::DECIMAL(38,0) * q0 - s0::DECIMAL(38,0) * s0::DECIMAL(38,0))::DOUBLE
       / n0::DOUBLE
     + (n1::DECIMAL(38,0) * q1 - s1::DECIMAL(38,0) * s1::DECIMAL(38,0))::DOUBLE
       / n1::DOUBLE) / (n0 + n1 - 2)::DOUBLE AS s2p
  FROM agg
)
SELECT n0, n1,
  ROUND(s0::DOUBLE / n0::DOUBLE, 6) AS mean_ctrl_cents,
  ROUND(sqrt(s2p), 6) AS sd_pooled,
  ROUND({_Z_ALPHA2 + _Z_BETA} * sqrt(s2p * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE)), 6)
    AS mde_cents,
  ROUND({_Z_ALPHA2 + _Z_BETA} * sqrt(s2p * (1.0 / n0::DOUBLE + 1.0 / n1::DOUBLE))
        / (s0::DOUBLE / n0::DOUBLE) * 100.0, 6) AS mde_pct_of_ctrl
FROM terms
"""


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence drift monitor (the symmetric-bounded PSI twin)
# ---------------------------------------------------------------------------

_JS_BUCKETS = 10


def js_divergence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence (nats) of ``events.value`` between the
    first and second half of the observed time range — the symmetric,
    bounded (≤ ln 2) complement to ``psi_value_drift``: PSI explodes on
    empty bins, JSD saturates, so monitoring dashboards use both.

    Identical integer binning/smoothing scheme to the PSI entry (exact
    cents, DIV-binning over broadcast bounds, Laplace (n+1)/(N+B)
    shares). Per-bin term = ½·p·ln(p/m) + ½·q·ln(q/m) with m = (p+q)/2;
    the TOTAL row (bucket −1) sums terms through DECIMAL(20,8) so it is
    shuffle-order-independent.

    Scale: two 1-row broadcast aggregates + ONE grouped count pass over
    the fact; everything downstream is arithmetic on ≤10 metadata rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        _cents().alias("cents"), F.unix_timestamp("ts").alias("at")
    )
    bounds = ev.agg(
        F.min("cents").alias("__lo"),
        F.max("cents").alias("__hi"),
        F.min("at").alias("__t0"),
        F.max("at").alias("__t1"),
    )
    counted = (
        ev.join(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.expr(
                f"((cents - __lo) * {_JS_BUCKETS}) DIV (__hi - __lo + 1) + 1"
            ),
        )
        .withColumn("__mid", F.expr("(__t0 + __t1) DIV 2"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("at") <= F.col("__mid"), 1).otherwise(0)).alias(
                "n_a"
            ),
            F.sum(F.when(F.col("at") > F.col("__mid"), 1).otherwise(0)).alias(
                "n_b"
            ),
        )
    )
    totals = counted.agg(F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb"))
    p = (F.col("n_a") + 1) / (F.col("__ta") + _JS_BUCKETS)
    q = (F.col("n_b") + 1) / (F.col("__tb") + _JS_BUCKETS)
    mm = (p + q) / 2
    terms = (
        counted.join(F.broadcast(totals))
        .withColumn(
            "__term",
            F.lit(0.5) * (p * F.log(p / mm)) + F.lit(0.5) * (q * F.log(q / mm)),
        )
        .select("bucket", "n_a", "n_b", "__term")
    )
    per_bucket = terms.select(
        "bucket", "n_a", "n_b", F.round("__term", 6).alias("js_term")
    )
    total = terms.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.round(
            F.sum(F.col("__term").cast("decimal(20,8)")).cast("double"), 6
        ).alias("js_term"),
    )
    return per_bucket.unionByName(total)


JS_DRIFT_SQL = f"""
WITH ev AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS cents,
         FLOOR(epoch(ts))::BIGINT AS at
  FROM events
), bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi,
         MIN(at) AS t0, MAX(at) AS t1 FROM ev
), counted AS (
  SELECT ((cents - lo) * {_JS_BUCKETS}) // (hi - lo + 1) + 1 AS bucket,
         SUM(CASE WHEN at <= (t0 + t1) // 2 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         SUM(CASE WHEN at > (t0 + t1) // 2 THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM ev, bounds GROUP BY 1
), totals AS (
  SELECT SUM(n_a)::BIGINT AS ta, SUM(n_b)::BIGINT AS tb FROM counted
), terms AS (
  SELECT bucket, n_a, n_b,
    0.5 * ((n_a + 1)::DOUBLE / (ta + {_JS_BUCKETS})
           * ln(((n_a + 1)::DOUBLE / (ta + {_JS_BUCKETS}))
                / (((n_a + 1)::DOUBLE / (ta + {_JS_BUCKETS})
                    + (n_b + 1)::DOUBLE / (tb + {_JS_BUCKETS})) / 2)))
    + 0.5 * ((n_b + 1)::DOUBLE / (tb + {_JS_BUCKETS})
           * ln(((n_b + 1)::DOUBLE / (tb + {_JS_BUCKETS}))
                / (((n_a + 1)::DOUBLE / (ta + {_JS_BUCKETS})
                    + (n_b + 1)::DOUBLE / (tb + {_JS_BUCKETS})) / 2))) AS term
  FROM counted, totals
)
SELECT bucket, n_a, n_b, round(term, 6) AS js_term FROM terms
UNION ALL
SELECT -1::BIGINT AS bucket, SUM(n_a)::BIGINT, SUM(n_b)::BIGINT,
       round(CAST(CAST(SUM(CAST(term AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
FROM terms
"""


# ---------------------------------------------------------------------------
# Gini concentration of per-customer revenue
# ---------------------------------------------------------------------------


def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue — the standard
    whale-concentration KPI. With revenues sorted ascending and ranked
    1..n, G = (2·Σ i·cᵢ − (n+1)·Σcᵢ) / (n·Σcᵢ).

    The global ascending rank comes from ``global_row_index``
    (operators/layout.py) — range-bucketed two-phase numbering, NO
    single-partition sort — with (cents, custkey) as the deterministic
    total order. Numerator and denominator stay exact in DECIMAL(38,0);
    G is one double division. Customers with no orders are out of frame
    (revenue universe, not account universe) — documented, and the twin
    aggregates the same inner set.

    Scale: one fact aggregate to customer grain, then the two-phase
    numbering (metadata-sized offset table) and one final agg — no
    global sort anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.select(
            "o_custkey", _cents("o_totalprice").alias("cents")
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    idx = global_row_index(
        per_cust, key="cents", tiebreak=("o_custkey",), index_col="i"
    )
    d38 = "decimal(38,0)"
    agg = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("i").cast(d38) * F.col("cents").cast(d38)).alias("__ic"),
    )
    num = (
        F.lit(2).cast(d38) * F.col("__ic")
        - (F.col("n_customers") + 1).cast(d38) * F.col("total_cents").cast(d38)
    ).cast("double")
    den = (
        F.col("n_customers").cast(d38) * F.col("total_cents").cast(d38)
    ).cast("double")
    return agg.select(
        "n_customers", "total_cents", F.round(num / den, 6).alias("gini")
    )


GINI_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT
           AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey)::BIGINT AS i
  FROM per_cust
), agg AS (
  SELECT COUNT(*)::BIGINT AS n_customers, SUM(cents)::BIGINT AS total_cents,
         SUM(i::DECIMAL(38,0) * cents::DECIMAL(38,0)) AS ic
  FROM ranked
)
SELECT n_customers, total_cents,
  ROUND((2::DECIMAL(38,0) * ic
         - (n_customers + 1)::DECIMAL(38,0) * total_cents::DECIMAL(38,0))::DOUBLE
        / (n_customers::DECIMAL(38,0) * total_cents::DECIMAL(38,0))::DOUBLE, 6)
    AS gini
FROM agg
"""


# ---------------------------------------------------------------------------
# Inter-arrival burstiness per user
# ---------------------------------------------------------------------------


def burstiness_user_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness of event inter-arrival times:
    B = (σ−μ)/(σ+μ) over the gap-seconds sequence (B→−1 periodic,
    B≈0 Poisson, B→1 bursty) — the standard temporal-regularity signal
    for bot/abuse triage and event-stream QA. Users need ≥3 events
    (≥2 gaps) to have a defined σ.

    Determinism: gaps are exact integer seconds from a (ts, event_id)
    total order; population σ uses the ÷n-free form
    σ = √(n·ΣΔ²−(ΣΔ)²)/n — one portable √ of an exact integer and one
    division; μ, B are fixed-order doubles rounded to 6dp.

    Scale: the lag window and the per-user aggregate cluster on the
    SAME key, so one exchange serves both; output is user-grained
    (∝ distinct users, not events).
    """
    return burstiness_over(load_table(spark, sf_dir, "events"))


def burstiness_over(events: DataFrame) -> DataFrame:
    """Frame-level core of :func:`burstiness_user_interarrival` — also
    the batch twin the streaming fold (streaming/stateful.py::
    burstiness_stream, O(1) integer state per user) must reproduce
    bit-for-bit (tests/test_stateful_burstiness.py)."""
    ev = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("at"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("at", "event_id")
    gaps = ev.withColumn("__gap", F.col("at") - F.lag("at").over(w)).filter(
        F.col("__gap").isNotNull()
    )
    d38 = "decimal(38,0)"
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("__gap").cast("bigint").alias("__s"),
        F.sum(F.col("__gap").cast(d38) * F.col("__gap").cast(d38)).alias("__q"),
    ).filter(F.col("n_gaps") >= 2)
    varn = (
        F.col("n_gaps").cast(d38) * F.col("__q")
        - F.col("__s").cast(d38) * F.col("__s").cast(d38)
    ).cast("double")
    mu = F.col("__s").cast("double") / F.col("n_gaps").cast("double")
    sigma = F.sqrt(varn) / F.col("n_gaps").cast("double")
    return per_user.select(
        "user_id",
        "n_gaps",
        F.round(mu, 6).alias("mean_gap_s"),
        F.round(sigma, 6).alias("sd_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )


BURSTINESS_SQL = """
WITH gaps AS (
  SELECT user_id,
    FLOOR(epoch(ts))::BIGINT
      - LAG(FLOOR(epoch(ts))::BIGINT)
          OVER (PARTITION BY user_id ORDER BY FLOOR(epoch(ts))::BIGINT, event_id)
      AS gap
  FROM events
), per_user AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_gaps, SUM(gap)::BIGINT AS s,
         SUM(gap::DECIMAL(38,0) * gap::DECIMAL(38,0)) AS q
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY user_id HAVING COUNT(*) >= 2
)
SELECT user_id, n_gaps,
  ROUND(s::DOUBLE / n_gaps::DOUBLE, 6) AS mean_gap_s,
  ROUND(sqrt((n_gaps::DECIMAL(38,0) * q - s::DECIMAL(38,0) * s::DECIMAL(38,0))::DOUBLE)
        / n_gaps::DOUBLE, 6) AS sd_gap_s,
  ROUND((sqrt((n_gaps::DECIMAL(38,0) * q - s::DECIMAL(38,0) * s::DECIMAL(38,0))::DOUBLE)
         / n_gaps::DOUBLE - s::DOUBLE / n_gaps::DOUBLE)
        / (sqrt((n_gaps::DECIMAL(38,0) * q - s::DECIMAL(38,0) * s::DECIMAL(38,0))::DOUBLE)
           / n_gaps::DOUBLE + s::DOUBLE / n_gaps::DOUBLE), 6) AS burstiness
FROM per_user
"""


# ---------------------------------------------------------------------------
# Mann–Kendall trend significance test (the Theil–Sen companion)
# ---------------------------------------------------------------------------


def mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall non-parametric trend test on the daily total-cents
    series — the significance companion to ``theil_sen_daily_trend``
    (Sen gives the slope, MK says whether a monotone trend exists at
    all): S = Σᵢ<ⱼ sign(cⱼ−cᵢ), tie-corrected
    Var(S) = (n(n−1)(2n+5) − Σₜ t(t−1)(2t+5))/18, and the
    continuity-corrected z = (S∓1)/√Var(S).

    Determinism: S and both variance numerators are EXACT integers
    (sign of a BIGINT difference, integer tie-group sums); Var(S) is
    one division by 18.0, z is subtract/divide/√ in fixed order; the
    significance flag compares z against the literal 1.959964.

    Scale: the fact collapses to the day-grained aggregate first; the
    O(days²) sign expansion and the tie scan are metadata-sized
    (calendar-bounded), exactly like the Theil–Sen entry.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(F.to_date("ts").alias("day"), _cents().alias("cents"))
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("c"))
    )
    a, b = days.alias("a"), days.alias("b")
    s_stat = (
        a.join(F.broadcast(b), F.col("a.day") < F.col("b.day"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nd = days.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        days.groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("__tie")
        )
    )
    joined = s_stat.join(F.broadcast(nd)).join(F.broadcast(ties))
    n = F.col("n_days")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("__tie")).cast("double")
        / F.lit(18.0)
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "n_days",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.959964).alias("significant"),
    )


MANN_KENDALL_SQL = """
WITH days AS (
  SELECT ts::DATE AS day,
         SUM((CAST(value AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1
), s AS (
  SELECT SUM(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
             ELSE 0 END)::BIGINT AS s_stat
  FROM days a JOIN days b ON a.day < b.day
), nd AS (
  SELECT COUNT(*)::BIGINT AS n_days FROM days
), ties AS (
  SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tie
  FROM (SELECT COUNT(*)::BIGINT AS t FROM days GROUP BY c)
), j AS (
  SELECT s_stat, n_days,
    (n_days * (n_days - 1) * (2 * n_days + 5) - tie)::DOUBLE / 18.0 AS var_s
  FROM s CROSS JOIN nd CROSS JOIN ties
)
SELECT n_days, s_stat, ROUND(var_s, 6) AS var_s,
  ROUND(CASE WHEN s_stat > 0 THEN (s_stat - 1)::DOUBLE / sqrt(var_s)
             WHEN s_stat < 0 THEN (s_stat + 1)::DOUBLE / sqrt(var_s)
             ELSE 0.0 END, 6) AS z,
  abs(CASE WHEN s_stat > 0 THEN (s_stat - 1)::DOUBLE / sqrt(var_s)
           WHEN s_stat < 0 THEN (s_stat + 1)::DOUBLE / sqrt(var_s)
           ELSE 0.0 END) > 1.959964 AS significant
FROM j
"""


# ---------------------------------------------------------------------------
# Mutual information between event type and day-of-week
# ---------------------------------------------------------------------------


def mi_event_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between ``event_type`` and day-of-week
    — the categorical-association readout that χ²
    (``chi_square_independence``) tests but doesn't quantify in
    information units; MI is the quantity feature-selection pipelines
    rank by. Per-cell term = (n_xy/N)·ln(n_xy·N/(n_x·n_y)), with the
    marginals broadcast back onto the ≤|types|·7 cell grid and the
    TOTAL row (event_type 'TOTAL', dow −1) summed through
    DECIMAL(20,8) (shuffle-order-independent, the ``psi_value_drift``
    trick). dow parity: Spark ``dayofweek`` ≡ DuckDB ``dayofweek + 1``
    (the ``dow_seasonality_events`` convention).

    Scale: ONE grouped count over the fact; margins and terms are
    metadata-sized arithmetic on the cell grid.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type", F.dayofweek(F.to_date("ts")).alias("dow")
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    mx = cells.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("nx"))
    my = cells.groupBy("dow").agg(F.sum("n").cast("bigint").alias("ny"))
    nn = cells.agg(F.sum("n").cast("bigint").alias("__N"))
    d38 = "decimal(38,0)"
    terms = (
        cells.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "dow")
        .join(F.broadcast(nn))
        .withColumn(
            "__term",
            (F.col("n").cast("double") / F.col("__N").cast("double"))
            * F.log(
                (F.col("n").cast(d38) * F.col("__N").cast(d38)).cast("double")
                / (F.col("nx").cast(d38) * F.col("ny").cast(d38)).cast(
                    "double"
                )
            ),
        )
    )
    per_cell = terms.select(
        "event_type", "dow", "n", F.round("__term", 6).alias("mi_term")
    )
    total = terms.agg(
        F.lit("TOTAL").alias("event_type"),
        F.lit(-1).cast("int").alias("dow"),
        F.sum("n").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("__term").cast("decimal(20,8)")).cast("double"), 6
        ).alias("mi_term"),
    )
    return per_cell.unionByName(total)


MI_SQL = """
WITH cells AS (
  SELECT event_type, dayofweek(ts::DATE) + 1 AS dow, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), mx AS (
  SELECT event_type, SUM(n)::BIGINT AS nx FROM cells GROUP BY event_type
), my AS (
  SELECT dow, SUM(n)::BIGINT AS ny FROM cells GROUP BY dow
), nn AS (
  SELECT SUM(n)::BIGINT AS grand FROM cells
), terms AS (
  SELECT c.event_type, c.dow, c.n,
    (c.n::DOUBLE / grand::DOUBLE)
      * ln((c.n::DECIMAL(38,0) * grand::DECIMAL(38,0))::DOUBLE
           / (nx::DECIMAL(38,0) * ny::DECIMAL(38,0))::DOUBLE) AS term
  FROM cells c
  JOIN mx USING (event_type) JOIN my USING (dow) CROSS JOIN nn
)
SELECT event_type, dow::INT AS dow, n, ROUND(term, 6) AS mi_term FROM terms
UNION ALL
SELECT 'TOTAL' AS event_type, -1::INT AS dow, SUM(n)::BIGINT AS n,
  ROUND(CAST(CAST(SUM(CAST(term AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
    AS mi_term
FROM terms
"""


# ---------------------------------------------------------------------------
# Lorenz curve deciles (the Gini entry's distributional detail)
# ---------------------------------------------------------------------------


def lorenz_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of per-customer revenue in ten equal-population
    deciles: each decile's revenue share and the cumulative share —
    the curve whose area deficit IS ``gini_customer_revenue`` (the two
    entries cross-check each other). Decile cut uses the same
    ``global_row_index`` two-phase rank and the explicit
    ((i−1)·10) DIV n + 1 bucket formula (no ntile ambiguity, no global
    sort).

    Determinism: per-decile sums are exact BIGINTs; shares are one
    double division each; the cumulative share runs over 10 metadata
    rows in decile order.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.select(
            "o_custkey", _cents("o_totalprice").alias("cents")
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    idx = global_row_index(
        per_cust, key="cents", tiebreak=("o_custkey",), index_col="i"
    )
    n = idx.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    per_dec = (
        idx.join(F.broadcast(n))
        .withColumn("decile", F.expr("((i - 1) * 10) DIV __n + 1"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("decile_cents"),
        )
    )
    tot = per_dec.agg(F.sum("decile_cents").cast("bigint").alias("__t"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_tot = per_dec.join(F.broadcast(tot))
    return with_tot.select(
        "decile",
        "n_customers",
        "decile_cents",
        F.round(
            F.col("decile_cents").cast("double") / F.col("__t").cast("double"),
            6,
        ).alias("share"),
        F.round(
            F.sum("decile_cents").over(wc).cast("double")
            / F.col("__t").cast("double"),
            6,
        ).alias("cum_share"),
    )


LORENZ_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT
           AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey)::BIGINT AS i,
         COUNT(*) OVER ()::BIGINT AS n
  FROM per_cust
), per_dec AS (
  SELECT ((i - 1) * 10) // n + 1 AS decile,
         COUNT(*)::BIGINT AS n_customers,
         SUM(cents)::BIGINT AS decile_cents
  FROM ranked GROUP BY 1
), tot AS (
  SELECT SUM(decile_cents)::BIGINT AS t FROM per_dec
)
SELECT decile, n_customers, decile_cents,
  ROUND(decile_cents::DOUBLE / t::DOUBLE, 6) AS share,
  ROUND((SUM(decile_cents) OVER (ORDER BY decile))::DOUBLE / t::DOUBLE, 6)
    AS cum_share
FROM per_dec CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration per market segment
# ---------------------------------------------------------------------------


def hhi_segment_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of customer-revenue concentration
    within each market segment: HHI = Σ (shareᵢ·100)² in the standard
    0–10000 points scale (antitrust convention: <1500 competitive,
    >2500 concentrated) — the per-segment drilldown next to the global
    ``gini_customer_revenue``.

    Determinism: each customer's share² term is ONE double division of
    exact DECIMAL(38,0) squares (c²/T²), scaled by the literal 10⁴;
    the per-segment sum rides DECIMAL(20,8)
    (partition-order-independent).

    Scale: one fact aggregate to (custkey) grain, one dimension join on
    the customer key, one segment-total aggregate broadcast back, one
    per-segment sum — the fact is touched once.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per_cust = (
        orders.select(
            "o_custkey", _cents("o_totalprice").alias("cents")
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("c"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_mktsegment").alias("segment"), "c")
    )
    totals = per_cust.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("c").cast("bigint").alias("t"),
    )
    d38 = "decimal(38,0)"
    terms = per_cust.join(F.broadcast(totals), "segment").withColumn(
        "__term",
        (F.col("c").cast(d38) * F.col("c").cast(d38)).cast("double")
        / (F.col("t").cast(d38) * F.col("t").cast(d38)).cast("double")
        * F.lit(10000.0),
    )
    return terms.groupBy("segment").agg(
        F.max("n_customers").alias("n_customers"),
        F.max("t").alias("segment_cents"),
        F.round(
            F.sum(F.col("__term").cast("decimal(20,8)")).cast("double"), 6
        ).alias("hhi_points"),
    )


HHI_SQL = """
WITH per_cust AS (
  SELECT c.c_mktsegment AS segment,
         SUM((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT AS c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
), totals AS (
  SELECT segment, COUNT(*)::BIGINT AS n_customers, SUM(c)::BIGINT AS t
  FROM per_cust GROUP BY segment
), terms AS (
  SELECT p.segment, n_customers, t,
    (p.c::DECIMAL(38,0) * p.c::DECIMAL(38,0))::DOUBLE
      / (t::DECIMAL(38,0) * t::DECIMAL(38,0))::DOUBLE * 10000.0 AS term
  FROM per_cust p JOIN totals USING (segment)
)
SELECT segment, MAX(n_customers)::BIGINT AS n_customers,
  MAX(t)::BIGINT AS segment_cents,
  ROUND(CAST(CAST(SUM(CAST(term AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
    AS hhi_points
FROM terms GROUP BY segment
"""


# ---------------------------------------------------------------------------
# Exact weighted median (global_prefix_sum demonstration)
# ---------------------------------------------------------------------------


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median of line-item price — "the price of
    the median UNIT shipped", the volume-aware center no unweighted
    median gives. The cumulative weights come from ``global_prefix_sum``
    (operators/layout.py — two-phase bucketed running sum, NO
    single-partition ``SUM() OVER (ORDER BY …)``), and the median is
    the smallest price whose inclusive cumulative weight reaches half
    the total — selected by the integer comparison 2·cum ≥ W, no
    division, no float seam.

    Scale: one prefix-sum pass (metadata-sized offset table) + one
    1-row selection aggregate; the tie order (price, orderkey,
    linenumber) is total so both engines accumulate identically.
    """
    from ..operators.layout import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        _cents("l_extendedprice").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = global_prefix_sum(
        li,
        key="cents",
        weight="qty",
        cum_col="cw",
        tiebreak=("l_orderkey", "l_linenumber"),
    )
    # totals from the RAW frame, not the prefix frame — aggregating cum
    # would re-derive the whole two-phase lineage a second time
    tot = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("qty").cast("bigint").alias("total_qty"),
    )
    return (
        cum.join(F.broadcast(tot))
        .filter(2 * F.col("cw") >= F.col("total_qty"))
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("total_qty").alias("total_qty"),
            F.min("cents").alias("weighted_median_cents"),
        )
    )


def weighted_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted quartiles (p25/p50/p75) of line-item
    price — the full distributional readout over the same
    ``global_prefix_sum`` cumulative-weight frame as
    :func:`weighted_median_price`: quantile p = smallest price whose
    inclusive cumulative weight reaches p·W, selected by the integer
    comparison 4·cum ≥ k·W (k = 1, 2, 3) — one prefix pass serves all
    three cuts, no division, no float seam.
    """
    from ..operators.layout import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        _cents("l_extendedprice").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = global_prefix_sum(
        li,
        key="cents",
        weight="qty",
        cum_col="cw",
        tiebreak=("l_orderkey", "l_linenumber"),
    )
    # totals from the RAW frame (see weighted_median_price)
    tot = li.agg(F.sum("qty").cast("bigint").alias("__w"))
    ks = spark.range(1, 4).select(F.col("id").cast("int").alias("quartile"))
    return (
        cum.join(F.broadcast(tot))
        .join(F.broadcast(ks))
        .filter(4 * F.col("cw") >= F.col("quartile") * F.col("__w"))
        .groupBy("quartile")
        .agg(
            F.max("__w").alias("total_qty"),
            F.min("cents").alias("quantile_cents"),
        )
    )


WEIGHTED_QUANTILES_SQL = """
WITH li AS (
  SELECT (CAST(l_extendedprice AS DECIMAL(12,2)) * 100)::BIGINT AS cents,
         l_quantity::BIGINT AS qty, l_orderkey, l_linenumber
  FROM lineitem
), cum AS (
  SELECT cents, qty,
    SUM(qty) OVER (ORDER BY cents, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cw
  FROM li
), tot AS (
  SELECT SUM(qty)::BIGINT AS w FROM li
)
SELECT k.quartile, MAX(w) AS total_qty, MIN(cents) AS quantile_cents
FROM cum CROSS JOIN tot
CROSS JOIN (SELECT unnest(range(1, 4))::INT AS quartile) k
WHERE 4 * cw >= k.quartile * w
GROUP BY k.quartile
"""


WEIGHTED_MEDIAN_SQL = """
WITH li AS (
  SELECT (CAST(l_extendedprice AS DECIMAL(12,2)) * 100)::BIGINT AS cents,
         l_quantity::BIGINT AS qty, l_orderkey, l_linenumber
  FROM lineitem
), cum AS (
  SELECT cents, qty,
    SUM(qty) OVER (ORDER BY cents, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS cw
  FROM li
), tot AS (
  SELECT COUNT(*)::BIGINT AS n_rows, SUM(qty)::BIGINT AS total_qty FROM li
)
SELECT MAX(n_rows) AS n_rows, MAX(total_qty) AS total_qty,
       MIN(cents) AS weighted_median_cents
FROM cum CROSS JOIN tot WHERE 2 * cw >= total_qty
"""


# ---------------------------------------------------------------------------
# Huber M-estimator of location (fixed-iteration IRLS)
# ---------------------------------------------------------------------------


def huber_location_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimate of the typical transaction value: rank-selected
    median and MAD seed c = 1.345·1.4826·MAD, then TWO fixed IRLS
    steps μₖ₊₁ = Σwᵢxᵢ/Σwᵢ with w = min(1, c/|x−μₖ|) — the robust mean
    between the (outlier-free but inefficient) median and the
    (efficient but fragile) mean; ``trimmed_mean_cents``'s
    M-estimator sibling. The iteration count is FIXED (two steps from
    a median start is the textbook recipe), so the plan is static and
    deterministic — no convergence test, no driver loop.

    Determinism: both medians are rank-selected on exact integers
    (deviations kept in half-cents: |2x − (m_lo+m_hi)| stays a BIGINT,
    so the MAD median never touches a float key); each weight/product
    is a fixed-order per-row double chain; all Σw/Σwx ride
    DECIMAL(20,8).

    Scale: two ``global_row_index`` rank passes + two weighted
    aggregates — four linear passes, no data-sized window, no
    single-partition sort.
    """
    ev = load_table(spark, sf_dir, "events").select(
        _cents().alias("x"), "event_id"
    )
    m0 = _ranksel_median2(ev, "x", "event_id", "__m2")  # 2·median
    dev = ev.join(F.broadcast(m0)).select(
        F.abs(2 * F.col("x") - F.col("__m2")).alias("d2"),
        "event_id",
        "__m2",
    )
    mad2 = _ranksel_median2(dev, "d2", "event_id", "__mad4")  # 4·MAD
    d20 = "decimal(20,8)"

    def _step(mu_col):  # noqa: ANN001, ANN202 — one IRLS step
        absdev = F.abs(F.col("x").cast("double") - mu_col)
        w = F.least(F.lit(1.0), F.col("__c") / absdev)
        # |x−μ| can be exactly 0 → c/0 = Inf → least() gives 1.0 in
        # Spark, but make the guard explicit for ANSI/DuckDB parity
        w = F.when(absdev == 0.0, F.lit(1.0)).otherwise(w)
        return (
            F.sum((w * F.col("x").cast("double")).cast(d20)).cast("double"),
            F.sum(w.cast(d20)).cast("double"),
        )

    base = (
        ev.join(F.broadcast(m0))
        .join(F.broadcast(mad2))
        .withColumn("__med", F.col("__m2").cast("double") / F.lit(2.0))
        .withColumn(
            "__c",
            F.lit(_HUBER_K)
            * (F.col("__mad4").cast("double") / F.lit(4.0)),
        )
    )
    sx1, sw1 = _step(F.col("__med"))
    it1 = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("__med").alias("__med"),
        F.max("__c").alias("__c"),
        (sx1 / sw1).alias("__mu1"),
    )
    sx2, sw2 = _step(F.col("__mu1"))
    it2 = base.join(F.broadcast(it1.select("__mu1"))).agg(
        (sx2 / sw2).alias("__mu2")
    )
    return it1.join(F.broadcast(it2)).select(
        "n_events",
        F.round("__med", 6).alias("median_cents"),
        F.round("__c", 6).alias("huber_c"),
        F.round("__mu1", 6).alias("mu_step1"),
        F.round("__mu2", 6).alias("mu_step2"),
    )


def _ranksel_median2(
    df: DataFrame, col: str, tiebreak: str, out: str
) -> DataFrame:
    """2·median of an exact-integer column as a 1-row frame (the sum of
    the two middle order statistics — exact, no halving float). n odd
    selects ONE row (both rank conditions coincide), so the ×(3−count)
    factor doubles it; n even selects two and the factor is 1."""
    from ..operators.layout import global_row_index

    idx = global_row_index(df, key=col, tiebreak=(tiebreak,), index_col="__r")
    n = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    return (
        idx.join(F.broadcast(n))
        .filter(
            (F.col("__r") == F.expr("(__n + 1) DIV 2"))
            | (F.col("__r") == F.expr("__n DIV 2 + 1"))
        )
        .agg(
            (F.sum(col) * (3 - F.count(F.lit(1))))
            .cast("bigint")
            .alias(out)
        )
    )


# 1.345·1.4826 as ONE double literal shared verbatim by both engines —
# DuckDB would otherwise evaluate the two decimal literals' product in
# exact DECIMAL (1.99409700) while Spark/Python multiply doubles, a
# 1-ulp seam that flips HALF_UP rounding at the 6dp boundary
_HUBER_K = 1.345 * 1.4826

HUBER_SQL = f"""
WITH ev AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS x, event_id
  FROM events
), n1 AS (
  SELECT COUNT(*)::BIGINT AS n FROM ev
), r1 AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, event_id) AS r, n
  FROM ev CROSS JOIN n1
), m2 AS (
  SELECT (SUM(x) * (3 - COUNT(*)))::BIGINT AS m2
  FROM r1 WHERE r = (n + 1) // 2 OR r = n // 2 + 1
), dev AS (
  SELECT abs(2 * x - m2)::BIGINT AS d2, event_id FROM ev CROSS JOIN m2
), r2 AS (
  SELECT d2, ROW_NUMBER() OVER (ORDER BY d2, event_id) AS r,
         (SELECT n FROM n1) AS n
  FROM dev
), mad4 AS (
  SELECT (SUM(d2) * (3 - COUNT(*)))::BIGINT AS mad4
  FROM r2 WHERE r = (n + 1) // 2 OR r = n // 2 + 1
), consts AS (
  SELECT m2::DOUBLE / 2.0 AS med,
         CAST('{_HUBER_K!r}' AS DOUBLE) * (mad4::DOUBLE / 4.0) AS c
  FROM m2 CROSS JOIN mad4
), it1 AS (
  SELECT (SELECT n FROM n1) AS n_events, MAX(med) AS med, MAX(c) AS c1,
    CAST(CAST(SUM(CAST((CASE WHEN abs(x::DOUBLE - med) = 0.0 THEN 1.0
                        ELSE least(1.0, c / abs(x::DOUBLE - med)) END
                        * x::DOUBLE) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(CAST((CASE WHEN abs(x::DOUBLE - med) = 0.0 THEN 1.0
                          ELSE least(1.0, c / abs(x::DOUBLE - med)) END)
                   AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS mu1
  FROM ev CROSS JOIN consts
), it2 AS (
  SELECT
    CAST(CAST(SUM(CAST((CASE WHEN abs(x::DOUBLE - mu1) = 0.0 THEN 1.0
                        ELSE least(1.0, c / abs(x::DOUBLE - mu1)) END
                        * x::DOUBLE) AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM(CAST((CASE WHEN abs(x::DOUBLE - mu1) = 0.0 THEN 1.0
                          ELSE least(1.0, c / abs(x::DOUBLE - mu1)) END)
                   AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS mu2
  FROM ev CROSS JOIN consts CROSS JOIN it1
)
SELECT n_events,
  ROUND(med, 6) AS median_cents,
  ROUND(c1, 6) AS huber_c,
  ROUND(mu1, 6) AS mu_step1,
  ROUND(mu2, 6) AS mu_step2
FROM it1 CROSS JOIN it2
"""


# ---------------------------------------------------------------------------
# Hill tail-index estimator (heavy-tail diagnostic)
# ---------------------------------------------------------------------------

_HILL_K = 100


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index of per-customer revenue:
    α̂ = k / Σᵢ₌₁..k ln(x₍ₙ₋ᵢ₊₁₎ / x₍ₙ₋ₖ₎) over the top-k order
    statistics — the quantitative heavy-tail diagnostic behind the
    Gini/Lorenz concentration pair (α < 2 means whale revenue has
    effectively infinite variance: plan capacity and sampling
    accordingly). k = 100 fixed.

    Determinism: order statistics come from the ``global_row_index``
    two-phase rank; each ln() argument is one double division of exact
    BIGINTs; the log-sum rides DECIMAL(20,8); α̂ is one final division.

    Scale: one customer-grain aggregate, one two-phase rank pass, a
    1-row threshold broadcast, a k-row sum — no single-task sort.
    """
    from ..operators.layout import global_row_index

    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.select("o_custkey", _cents("o_totalprice").alias("cents"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    idx = global_row_index(
        per_cust, key="cents", tiebreak=("o_custkey",), index_col="i"
    )
    n = idx.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    with_n = idx.join(F.broadcast(n))
    thr = with_n.filter(F.col("i") == F.col("__n") - _HILL_K).select(
        F.col("cents").alias("__thr")
    )
    top = with_n.filter(F.col("i") > F.col("__n") - _HILL_K).join(
        F.broadcast(thr)
    )
    d20 = "decimal(20,8)"
    agg = top.agg(
        F.max("__n").alias("n_customers"),
        F.max("__thr").alias("threshold_cents"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.log(
                F.col("cents").cast("double") / F.col("__thr").cast("double")
            ).cast(d20)
        )
        .cast("double")
        .alias("__logsum"),
    )
    return agg.select(
        "n_customers",
        "k",
        "threshold_cents",
        F.round(
            F.col("k").cast("double") / F.col("__logsum"), 6
        ).alias("hill_alpha"),
    )


HILL_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         SUM((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT
           AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey)::BIGINT AS i,
         COUNT(*) OVER ()::BIGINT AS n
  FROM per_cust
), thr AS (
  SELECT cents AS t FROM ranked WHERE i = n - {_HILL_K}
), top AS (
  SELECT r.cents, r.n, t FROM ranked r CROSS JOIN thr
  WHERE r.i > r.n - {_HILL_K}
)
SELECT MAX(n) AS n_customers, COUNT(*)::BIGINT AS k,
  MAX(t) AS threshold_cents,
  ROUND(COUNT(*)::DOUBLE
        / CAST(CAST(SUM(CAST(ln(cents::DOUBLE / t::DOUBLE) AS DECIMAL(20,8)))
               AS VARCHAR) AS DOUBLE), 6) AS hill_alpha
FROM top
"""


# ---------------------------------------------------------------------------
# ABC (80/15/5) revenue classification of parts
# ---------------------------------------------------------------------------


def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of parts by revenue: parts sorted by
    revenue DESCENDING, class A = parts inside the first 80% of
    cumulative revenue, B = next 15% (to 95%), C = the tail — the
    classic Pareto workload split for stocking/caching policy. The
    descending cumulative revenue comes from ``global_prefix_sum`` on
    the NEGATED revenue key (order-preserving trick: two-phase prefix
    sums are ascending-only), and class boundaries are the INTEGER
    comparisons 5·cum ≤ 4·T and 20·cum ≤ 19·T — no percentage floats
    anywhere near the cut.

    Scale: one part-grain aggregate, one prefix-sum pass, one 3-group
    aggregate.
    """
    from ..operators.layout import global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.select("l_partkey", _cents("l_extendedprice").alias("cents"))
        .groupBy("l_partkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .withColumn("negc", -F.col("cents"))
    )
    cum = global_prefix_sum(
        per_part,
        key="negc",
        weight="cents",
        cum_col="cw",
        tiebreak=("l_partkey",),
    )
    # total from the part-grain frame, not the prefix frame (avoids
    # re-deriving the two-phase lineage — see weighted_median_price)
    tot = per_part.agg(F.sum("cents").cast("bigint").alias("__t"))
    classed = cum.join(F.broadcast(tot)).withColumn(
        "abc_class",
        F.when(5 * F.col("cw") <= 4 * F.col("__t"), F.lit("A"))
        .when(20 * F.col("cw") <= 19 * F.col("__t"), F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("class_cents"),
        F.round(
            F.sum("cents").cast("double") / F.max("__t").cast("double"), 6
        ).alias("revenue_share"),
    )


ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM((CAST(l_extendedprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT
           AS cents
  FROM lineitem GROUP BY l_partkey
), cum AS (
  SELECT cents,
    SUM(cents) OVER (ORDER BY -cents, l_partkey
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS cw
  FROM per_part
), tot AS (
  SELECT SUM(cents)::BIGINT AS t FROM per_part
), classed AS (
  SELECT cents, t,
    CASE WHEN 5 * cw <= 4 * t THEN 'A'
         WHEN 20 * cw <= 19 * t THEN 'B'
         ELSE 'C' END AS abc_class
  FROM cum CROSS JOIN tot
)
SELECT abc_class, COUNT(*)::BIGINT AS n_parts,
  SUM(cents)::BIGINT AS class_cents,
  ROUND(SUM(cents)::DOUBLE / MAX(t)::DOUBLE, 6) AS revenue_share
FROM classed GROUP BY abc_class
"""


# ---------------------------------------------------------------------------
# Point-biserial correlation: engagement vs conversion
# ---------------------------------------------------------------------------


def pointbiserial_engagement_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-biserial correlation between a user's engagement (event
    count) and a binary RECENCY outcome (purchased within the last
    quarter of the observation window — "any purchase ever" is
    degenerate on long windows, every account eventually buys once) —
    r_pb = (M₁−M₀)/s_n · √(n₁n₀/n²), the "does activity predict
    retention" number that sits between the funnel (counts) and a full
    uplift model.

    Determinism: the recency boundary is exact integer timestamp
    arithmetic on broadcast bounds; group sums/counts are exact
    integers; the population s_n comes from the ÷n-free form
    √(n·Σx²−S²)/n on exact DECIMAL(38,0); M₁−M₀ and the final product
    are fixed-order doubles rounded 6dp. Degenerate designs yield NULL
    via NULLIF divisors.

    Scale: one bounds aggregate (broadcast 1 row) + ONE user-level
    aggregate as the only full passes; the rest is a 1-row summary.
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("__t0"),
        F.max(F.unix_timestamp("ts")).alias("__t1"),
    )
    recent_purchase = (
        (F.col("event_type") == "purchase")
        & (
            F.unix_timestamp("ts") * 4
            >= F.col("__t0") + 3 * F.col("__t1")
        )
    ).cast("int")
    per_user = (
        ev.join(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.max(recent_purchase).alias("y"),
        )
    )
    d38 = "decimal(38,0)"
    agg = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("y").cast("bigint").alias("n_converted"),
        F.sum("x").cast("bigint").alias("__s"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("__q"),
        F.sum(F.when(F.col("y") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("__s1"),
    )
    n = F.col("n_users")
    n1 = F.col("n_converted")
    n0 = n - n1
    # degenerate designs (everyone or no-one converted, constant x)
    # yield NULL via the NULLIF-divisor pattern — guards must live
    # INSIDE divisors (ANSI mode + CSE, the chi-square lesson)
    m1 = F.col("__s1").cast("double") / F.nullif(
        n1.cast("double"), F.lit(0.0)
    )
    m0 = (F.col("__s") - F.col("__s1")).cast("double") / F.nullif(
        n0.cast("double"), F.lit(0.0)
    )
    sn = (
        F.sqrt(
            (n.cast(d38) * F.col("__q") - F.col("__s").cast(d38) * F.col("__s").cast(d38)).cast(
                "double"
            )
        )
        / n.cast("double")
    )
    rpb = (
        (m1 - m0)
        / F.nullif(sn, F.lit(0.0))
        * F.sqrt(
            (n1.cast(d38) * n0.cast(d38)).cast("double")
            / (n.cast(d38) * n.cast(d38)).cast("double")
        )
    )
    return agg.select(
        "n_users",
        "n_converted",
        F.round(m1, 6).alias("mean_events_converted"),
        F.round(m0, 6).alias("mean_events_not"),
        F.round(rpb, 6).alias("pointbiserial_r"),
    )


POINTBISERIAL_SQL = """
WITH bounds AS (
  SELECT MIN(FLOOR(epoch(ts))::BIGINT) AS t0,
         MAX(FLOOR(epoch(ts))::BIGINT) AS t1
  FROM events
), per_user AS (
  SELECT user_id, COUNT(*)::BIGINT AS x,
    MAX(CASE WHEN event_type = 'purchase'
              AND FLOOR(epoch(ts))::BIGINT * 4 >= t0 + 3 * t1
         THEN 1 ELSE 0 END) AS y
  FROM events CROSS JOIN bounds GROUP BY user_id
), agg AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS n1,
    SUM(x)::BIGINT AS s,
    SUM(x::DECIMAL(38,0) * x::DECIMAL(38,0)) AS q,
    SUM(CASE WHEN y = 1 THEN x ELSE 0 END)::BIGINT AS s1
  FROM per_user
)
SELECT n AS n_users, n1 AS n_converted,
  ROUND(s1::DOUBLE / NULLIF(n1::DOUBLE, 0.0), 6) AS mean_events_converted,
  ROUND((s - s1)::DOUBLE / NULLIF((n - n1)::DOUBLE, 0.0), 6)
    AS mean_events_not,
  ROUND((s1::DOUBLE / NULLIF(n1::DOUBLE, 0.0)
         - (s - s1)::DOUBLE / NULLIF((n - n1)::DOUBLE, 0.0))
        / NULLIF(sqrt((n::DECIMAL(38,0) * q
                 - s::DECIMAL(38,0) * s::DECIMAL(38,0))::DOUBLE) / n::DOUBLE,
                 0.0)
        * sqrt((n1::DECIMAL(38,0) * (n - n1)::DECIMAL(38,0))::DOUBLE
               / (n::DECIMAL(38,0) * n::DECIMAL(38,0))::DOUBLE), 6)
    AS pointbiserial_r
FROM agg
"""


# ---------------------------------------------------------------------------
# Per-segment ABC classification (grouped_prefix_sum demonstration)
# ---------------------------------------------------------------------------


def abc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (80/15/5) classification of CUSTOMERS within each market
    segment — the merchandising drilldown of
    :func:`abc_classification_parts`: every segment gets its own Pareto
    cut, so a whale in a small segment isn't drowned by the global
    distribution. Per-segment descending cumulative revenue comes from
    ``grouped_prefix_sum`` (operators/layout.py — per-group two-phase
    running sums, NO one-task-per-segment ``SUM() OVER (PARTITION
    BY segment ORDER BY …)``), and class boundaries are the integer
    comparisons 5·cum ≤ 4·T and 20·cum ≤ 19·T against broadcast
    per-segment totals.

    Scale: one fact aggregate to (segment, customer) grain, one grouped
    prefix pass, one ≤|segments|·3-group aggregate.
    """
    from ..operators.layout import grouped_prefix_sum

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per_cust = (
        orders.select(
            "o_custkey", _cents("o_totalprice").alias("cents")
        )
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"), "o_custkey", "cents"
        )
        .withColumn("negc", -F.col("cents"))
    )
    cum = grouped_prefix_sum(
        per_cust,
        group="segment",
        key="negc",
        weight="cents",
        cum_col="cw",
        tiebreak=("o_custkey",),
    )
    tot = per_cust.groupBy("segment").agg(
        F.sum("cents").cast("bigint").alias("__t")
    )
    classed = cum.join(F.broadcast(tot), "segment").withColumn(
        "abc_class",
        F.when(5 * F.col("cw") <= 4 * F.col("__t"), F.lit("A"))
        .when(20 * F.col("cw") <= 19 * F.col("__t"), F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return classed.groupBy("segment", "abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("class_cents"),
        F.round(
            F.sum("cents").cast("double") / F.max("__t").cast("double"), 6
        ).alias("revenue_share"),
    )


ABC_BY_SEGMENT_SQL = """
WITH per_cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM((CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT)::BIGINT
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT segment, cents,
    SUM(cents) OVER (PARTITION BY segment ORDER BY -cents, o_custkey
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS cw
  FROM per_cust
), tot AS (
  SELECT segment, SUM(cents)::BIGINT AS t FROM per_cust GROUP BY segment
), classed AS (
  SELECT c.segment, cents, t,
    CASE WHEN 5 * cw <= 4 * t THEN 'A'
         WHEN 20 * cw <= 19 * t THEN 'B'
         ELSE 'C' END AS abc_class
  FROM cum c JOIN tot USING (segment)
)
SELECT segment, abc_class, COUNT(*)::BIGINT AS n_customers,
  SUM(cents)::BIGINT AS class_cents,
  ROUND(SUM(cents)::DOUBLE / MAX(t)::DOUBLE, 6) AS revenue_share
FROM classed GROUP BY segment, abc_class
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register("theil_sen_daily_trend", theil_sen_daily_trend, THEIL_SEN_SQL)
    register("abc_by_segment", abc_by_segment, ABC_BY_SEGMENT_SQL)
    register(
        "pointbiserial_engagement_conversion",
        pointbiserial_engagement_conversion,
        POINTBISERIAL_SQL,
    )
    register("hill_tail_index", hill_tail_index, HILL_SQL)
    register(
        "abc_classification_parts", abc_classification_parts, ABC_SQL
    )
    register(
        "weighted_median_price", weighted_median_price, WEIGHTED_MEDIAN_SQL
    )
    register(
        "weighted_quantiles_price",
        weighted_quantiles_price,
        WEIGHTED_QUANTILES_SQL,
    )
    register("huber_location_cents", huber_location_cents, HUBER_SQL)
    register(
        "hhi_segment_concentration", hhi_segment_concentration, HHI_SQL
    )
    register(
        "mann_kendall_daily_trend", mann_kendall_daily_trend, MANN_KENDALL_SQL
    )
    register("mi_event_type_dow", mi_event_type_dow, MI_SQL)
    register("lorenz_revenue_deciles", lorenz_revenue_deciles, LORENZ_SQL)
    register("ab_power_mde", ab_power_mde, AB_POWER_SQL)
    register("js_divergence_drift", js_divergence_drift, JS_DRIFT_SQL)
    register("gini_customer_revenue", gini_customer_revenue, GINI_SQL)
    register(
        "burstiness_user_interarrival",
        burstiness_user_interarrival,
        BURSTINESS_SQL,
    )
