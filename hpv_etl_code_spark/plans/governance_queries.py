"""Data-governance and time-series entries (round 5): k-anonymity
census, rare-token containment pairs, day-of-week seasonal
decomposition.

All three are pure DataFrame compositions with exact DuckDB twins —
no UDFs, decimal-exact float aggregation where sums cross partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

# ------------------------------------------------ k-anonymity census

_K_THRESHOLDS = (2, 5, 10)


def k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk census over a quasi-identifier tuple —
    the governance report a training-data release runs before shipping
    records that describe people. QI = (nation, market segment,
    account-balance band): every record in an equivalence class of
    size < k is re-identifiable at that k. Output per k: class and
    record counts below k and the record risk share.

    Scale: ONE hash aggregation over the QI tuple builds the class
    histogram; the k-sweep is a tiny cross join over the (already
    aggregated) class sizes — cost is O(distinct QI), never a second
    pass over the records.
    """
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_n"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _K_THRESHOLDS])).alias("k")
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("class_n") < F.col("k")).cast("int"))
            .cast("long")
            .alias("n_small_classes"),
            F.sum(F.when(F.col("class_n") < F.col("k"), F.col("class_n")).otherwise(0))
            .cast("long")
            .alias("n_risky_records"),
            F.sum("class_n").cast("long").alias("n_records"),
        )
        .select(
            "k",
            "n_classes",
            "n_small_classes",
            "n_risky_records",
            F.round(
                F.col("n_risky_records").cast("double")
                / F.col("n_records").cast("double"),
                6,
            ).alias("risk_share"),
        )
    )


K_ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, FLOOR(c_acctbal / 1000) AS bal_band,
         COUNT(*) AS class_n
  FROM customer GROUP BY 1, 2, 3
), ks AS (SELECT unnest([{", ".join(str(k) for k in _K_THRESHOLDS)}]) AS k)
SELECT k,
  COUNT(*)::BIGINT AS n_classes,
  SUM(CASE WHEN class_n < k THEN 1 ELSE 0 END)::BIGINT AS n_small_classes,
  SUM(CASE WHEN class_n < k THEN class_n ELSE 0 END)::BIGINT AS n_risky_records,
  ROUND(SUM(CASE WHEN class_n < k THEN class_n ELSE 0 END)::DOUBLE
        / SUM(class_n)::DOUBLE, 6) AS risk_share
FROM classes CROSS JOIN ks
GROUP BY k
"""


_L_THRESHOLDS = (2, 3)


def l_diversity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companion to :func:`k_anonymity_census`: k-anonymity bounds
    IDENTITY disclosure, l-diversity bounds ATTRIBUTE disclosure — a
    class whose members all share one sensitive value leaks it even at
    large k. QI = (nation, balance band); sensitive = market segment.
    Output per l: classes with < l distinct sensitive values, the
    records they expose, and the risk share.

    Scale: one aggregation computes class size + distinct-sensitive
    count together (count_distinct over the class — Spark's two-phase
    Expand plan keeps it partial-aggregated); the l-sweep is a tiny
    broadcast cross join over class summaries.
    """
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey", F.floor(F.col("c_acctbal") / 1000).alias("bal_band")
    ).agg(
        F.count(F.lit(1)).alias("class_n"),
        F.countDistinct("c_mktsegment").alias("n_sensitive"),
    )
    ls = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in _L_THRESHOLDS])).alias("l")
    )
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("n_sensitive") < F.col("l")).cast("int"))
            .cast("long")
            .alias("n_low_div_classes"),
            F.sum(
                F.when(F.col("n_sensitive") < F.col("l"), F.col("class_n")).otherwise(0)
            )
            .cast("long")
            .alias("n_risky_records"),
            F.sum("class_n").cast("long").alias("n_records"),
        )
        .select(
            "l",
            "n_classes",
            "n_low_div_classes",
            "n_risky_records",
            F.round(
                F.col("n_risky_records").cast("double")
                / F.col("n_records").cast("double"),
                6,
            ).alias("risk_share"),
        )
    )


L_DIVERSITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, FLOOR(c_acctbal / 1000) AS bal_band,
         COUNT(*) AS class_n,
         COUNT(DISTINCT c_mktsegment) AS n_sensitive
  FROM customer GROUP BY 1, 2
), ls AS (SELECT unnest([{", ".join(str(v) for v in _L_THRESHOLDS)}]) AS l)
SELECT l,
  COUNT(*)::BIGINT AS n_classes,
  SUM(CASE WHEN n_sensitive < l THEN 1 ELSE 0 END)::BIGINT AS n_low_div_classes,
  SUM(CASE WHEN n_sensitive < l THEN class_n ELSE 0 END)::BIGINT AS n_risky_records,
  ROUND(SUM(CASE WHEN n_sensitive < l THEN class_n ELSE 0 END)::DOUBLE
        / SUM(class_n)::DOUBLE, 6) AS risk_share
FROM classes CROSS JOIN ls
GROUP BY l
"""


# ----------------------------------- rare-shingle containment pairs

_RARE_DF_MAX = 20  # a shingle is "rare" if its corpus doc frequency ≤ this
_CONTAIN_MIN = 0.8
_MIN_RARE = 5


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-containment: pairs (a, b) where ≥ {_CONTAIN_MIN}
    of a's RARE word-trigram shingles also appear in b — the
    quotation/boilerplate-inclusion detector (a small doc quoted inside
    a big one has low Jaccard and is invisible to symmetric near-dup
    mining, but its containment is ~1). Rare = corpus document
    frequency ≤ {_RARE_DF_MAX}: frequent shingles carry no identifying
    signal AND are what makes a naive inverted-index join quadratic, so
    the semantics and the scale mechanism are the same cut. Trigram
    shingles (not unigrams) because identity lives in token ORDER —
    and, on narrow vocabularies, single tokens are never rare.

    Scale: classic inverted-index join — explode distinct shingles,
    drop df > {_RARE_DF_MAX} postings, self-join the index on shingle.
    Every shingle contributes ≤ df² ≤ {_RARE_DF_MAX}² candidate rows,
    so the join output is linear in corpus size with a constant bound
    per posting — no hot-shingle explosion by construction.
    """
    from ..operators.textops import tokens

    d = load_table(spark, sf_dir, "documents")
    tk = d.select(F.col("doc_id").alias("id"), tokens("text").alias("t")).filter(
        F.size("t") >= 3
    )
    grams = tk.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + 1),
                        F.element_at("t", i + 2),
                    ),
                )
            )
        ).alias("g"),
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    rare = grams.join(
        F.broadcast(df_counts.filter(F.col("df") <= _RARE_DF_MAX)), "g", "left_semi"
    )
    rare_sizes = rare.groupBy("id").agg(F.count(F.lit(1)).alias("n_rare"))
    shared = (
        rare.select(F.col("id").alias("id_a"), "g")
        .join(rare.select(F.col("id").alias("id_b"), "g"), "g")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            rare_sizes.select(F.col("id").alias("id_a"), "n_rare"), "id_a"
        )
        .filter(F.col("n_rare") >= _MIN_RARE)
        .withColumn(
            "containment",
            F.round(
                F.col("n_shared").cast("double") / F.col("n_rare").cast("double"), 6
            ),
        )
        .filter(F.col("containment") >= _CONTAIN_MIN)
        .select("id_a", "id_b", "n_shared", "n_rare", "containment")
    )


CONTAINMENT_SQL = f"""
WITH tk AS (
  SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
), grams AS (
  SELECT id, unnest(list_distinct(
    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
  )) AS g
  FROM tk
), dfc AS (
  SELECT g, COUNT(*) AS df FROM grams GROUP BY g
), rare AS (
  SELECT t.id, t.g FROM grams t
  SEMI JOIN (SELECT g FROM dfc WHERE df <= {_RARE_DF_MAX}) r ON t.g = r.g
), rare_sizes AS (
  SELECT id, COUNT(*) AS n_rare FROM rare GROUP BY id
), shared AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
  FROM rare a JOIN rare b ON a.g = b.g AND a.id != b.id
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b, s.n_shared, rs.n_rare,
  ROUND(s.n_shared::DOUBLE / rs.n_rare::DOUBLE, 6) AS containment
FROM shared s JOIN rare_sizes rs ON s.id_a = rs.id
WHERE rs.n_rare >= {_MIN_RARE}
  AND s.n_shared::DOUBLE / rs.n_rare::DOUBLE >= {_CONTAIN_MIN}
"""


# ------------------------------------- day-of-week seasonal decompose

def dow_seasonality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition lite: daily value totals per event type,
    a centered 7-day moving-average trend (full weeks only, so every
    day-of-week contributes exactly once per window — the standard
    guard against weekday bias in the trend), and the day-of-week
    seasonal component = mean detrended residual. Output per
    (event_type, dow).

    Determinism: daily sums are decimal-exact (order-independent
    across the shuffle); the trend and seasonal means are fixed chains
    over those exact sums with one final rounding. One exchange on
    event_type serves the daily rollup, the trailing window and the
    final dow aggregate (window partition keys are supersets).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(20,8)")).alias("dsum")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = daily.select(
        "event_type",
        "day",
        F.col("dsum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
        F.sum("dsum").over(w).alias("win_sum"),
    ).filter(F.col("win_n") == 7)
    resid = trended.select(
        "event_type",
        F.dayofweek("day").alias("dow"),
        (
            F.col("dsum").cast("double")
            - F.col("win_sum").cast("double") / F.lit(7.0)
        ).alias("r"),
    )
    return (
        resid.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(F.col("r").cast("decimal(20,8)")).alias("rsum"),
        )
        .select(
            "event_type",
            "dow",
            "n_days",
            F.round(
                F.col("rsum").cast("double") / F.col("n_days").cast("double"), 6
            ).alias("seasonal"),
        )
    )


DOW_SEASONALITY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(20,8))) AS dsum
  FROM events GROUP BY 1, 2
), trended AS (
  SELECT event_type, day, dsum,
    COUNT(*) OVER w AS win_n,
    SUM(dsum) OVER w AS win_sum
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), resid AS (
  SELECT event_type, dayofweek(day) + 1 AS dow,
    dsum::DOUBLE - win_sum::DOUBLE / 7.0 AS r
  FROM trended WHERE win_n = 7
)
SELECT event_type, dow, COUNT(*)::BIGINT AS n_days,
  ROUND(SUM(CAST(r AS DECIMAL(20,8)))::DOUBLE / COUNT(*)::DOUBLE, 6) AS seasonal
FROM resid GROUP BY 1, 2
"""


# ------------------------------------------------ t-closeness census

_T_THRESHOLDS = (0.2, 0.35, 0.5)


def t_closeness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the governance trio (k-anonymity → identity,
    l-diversity → attribute presence, t-closeness → attribute
    DISTRIBUTION): a class can be k-anonymous and l-diverse yet still
    leak because its sensitive-value mix differs sharply from the
    population's. For the categorical sensitive attribute the earth-
    mover distance reduces to total variation: t(class) = ½·Σ_s
    |c_s/n_class − g_s/N|, zero-filled over the full sensitive domain
    (absent values contribute their global share). QI = (nation,
    balance band); sensitive = market segment — the same axes as the
    l-diversity census, so the three reports compose.

    Determinism: each term is two divisions + abs (identical chains in
    both engines); the per-class sum over the sensitive domain rides
    DECIMAL(20,8); thresholds compare the raw t on both sides.

    Scale: one (QI, sensitive) aggregation, a broadcast domain join
    (|domain| × |classes| grid — metadata-scale), and the usual
    broadcast threshold sweep. Never a second pass over records.
    """
    c = load_table(spark, sf_dir, "customer")
    qi_sv = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
        F.col("c_mktsegment").alias("sv"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c_s"))
    classes = qi_sv.groupBy("c_nationkey", "bal_band").agg(
        F.sum("c_s").cast("bigint").alias("class_n")
    )
    global_sv = c.groupBy(F.col("c_mktsegment").alias("sv")).agg(
        F.count(F.lit(1)).cast("bigint").alias("g_s")
    )
    totals = c.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    grid = (
        classes.join(F.broadcast(global_sv))
        .join(F.broadcast(totals))
        .join(qi_sv, ["c_nationkey", "bal_band", "sv"], "left")
        .na.fill({"c_s": 0})
    )
    term = F.abs(
        F.col("c_s").cast("double") / F.col("class_n").cast("double")
        - F.col("g_s").cast("double") / F.col("__n").cast("double")
    )
    per_class = grid.groupBy("c_nationkey", "bal_band").agg(
        F.max("class_n").alias("class_n"),
        (
            F.sum(term.cast("decimal(20,8)")).cast("double") / F.lit(2.0)
        ).alias("t"),
    )
    ts = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _T_THRESHOLDS])).alias("t_max")
    )
    return (
        per_class.crossJoin(F.broadcast(ts))
        .groupBy("t_max")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("t") > F.col("t_max")).cast("int"))
            .cast("long")
            .alias("n_violating_classes"),
            F.sum(
                F.when(F.col("t") > F.col("t_max"), F.col("class_n")).otherwise(0)
            )
            .cast("long")
            .alias("n_risky_records"),
            F.sum("class_n").cast("long").alias("n_records"),
            F.round(F.max("t"), 6).alias("max_t"),
        )
        .select(
            "t_max",
            "n_classes",
            "n_violating_classes",
            "n_risky_records",
            F.round(
                F.col("n_risky_records").cast("double")
                / F.col("n_records").cast("double"),
                6,
            ).alias("risk_share"),
            "max_t",
        )
    )


T_CLOSENESS_SQL = f"""
WITH qi_sv AS (
  SELECT c_nationkey, FLOOR(c_acctbal / 1000) AS bal_band,
         c_mktsegment AS sv, COUNT(*)::BIGINT AS c_s
  FROM customer GROUP BY 1, 2, 3
), classes AS (
  SELECT c_nationkey, bal_band, SUM(c_s)::BIGINT AS class_n
  FROM qi_sv GROUP BY 1, 2
), global_sv AS (
  SELECT c_mktsegment AS sv, COUNT(*)::BIGINT AS g_s FROM customer GROUP BY 1
), totals AS (SELECT COUNT(*)::BIGINT AS n FROM customer),
grid AS (
  SELECT cl.c_nationkey, cl.bal_band, cl.class_n, g.sv, g.g_s, t.n,
         COALESCE(q.c_s, 0)::BIGINT AS c_s
  FROM classes cl CROSS JOIN global_sv g CROSS JOIN totals t
  LEFT JOIN qi_sv q ON q.c_nationkey = cl.c_nationkey
   AND q.bal_band = cl.bal_band AND q.sv = g.sv
), per_class AS (
  SELECT c_nationkey, bal_band, MAX(class_n) AS class_n,
    CAST(CAST(SUM(CAST(abs(c_s::DOUBLE / class_n::DOUBLE
                           - g_s::DOUBLE / n::DOUBLE) AS DECIMAL(20,8)))
         AS VARCHAR) AS DOUBLE) / 2.0 AS t
  FROM grid GROUP BY 1, 2
), ts AS (SELECT unnest([{", ".join(str(t) for t in _T_THRESHOLDS)}]) AS t_max)
SELECT t_max,
  COUNT(*)::BIGINT AS n_classes,
  SUM(CASE WHEN t > t_max THEN 1 ELSE 0 END)::BIGINT AS n_violating_classes,
  SUM(CASE WHEN t > t_max THEN class_n ELSE 0 END)::BIGINT AS n_risky_records,
  ROUND(SUM(CASE WHEN t > t_max THEN class_n ELSE 0 END)::DOUBLE
        / SUM(class_n)::DOUBLE, 6) AS risk_share,
  ROUND(MAX(t), 6) AS max_t
FROM per_class CROSS JOIN ts
GROUP BY t_max
"""


_DP_EPSILON = 1.0


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private event-type counts via the Laplace
    mechanism (sensitivity 1, b = 1/ε): the release shape every
    privacy-preserving analytics surface publishes instead of raw
    counts. The Laplace draw is SEEDED — uniform u ∈ (−½, ½) from the
    top 52 bits of md5(event_type), mapped through the inverse CDF
    −b·sign(u)·ln(1−2|u|) — so the entry is deterministic and
    oracle-checkable. A production release would draw fresh randomness
    per query (seeded noise re-released is not DP across releases);
    the MECHANISM (sensitivity-1 counting query, inverse-CDF Laplace,
    ε accounting column) is exactly the production one.

    Scale: one grouped count (map-side partial) over the fact; the
    noise is per-GROUP arithmetic on ≤|types| metadata rows.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    h = F.conv(F.substring(F.md5("event_type"), 1, 13), 16, 10).cast("bigint")
    u = h.cast("double") / F.lit(float(2**52)) - F.lit(0.5)
    b = 1.0 / _DP_EPSILON
    noise = (
        F.lit(-b)
        * F.signum(u)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    return counts.select(
        "event_type",
        "n_true",
        F.lit(_DP_EPSILON).alias("epsilon"),
        F.round(noise, 6).alias("laplace_noise"),
        F.round(F.col("n_true").cast("double") + noise, 6).alias(
            "n_released"
        ),
    )


DP_NOISY_SQL = f"""
WITH counts AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_true FROM events GROUP BY 1
), seeded AS (
  SELECT event_type, n_true,
    ('0x' || substr(md5(event_type), 1, 13))::BIGINT::DOUBLE
      / CAST('{float(2**52)!r}' AS DOUBLE) - 0.5 AS u
  FROM counts
)
SELECT event_type, n_true,
  CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
  ROUND(-{1.0 / _DP_EPSILON} * sign(u) * ln(1.0 - 2.0 * abs(u)), 6)
    AS laplace_noise,
  ROUND(n_true::DOUBLE
        + (-{1.0 / _DP_EPSILON} * sign(u) * ln(1.0 - 2.0 * abs(u))), 6)
    AS n_released
FROM seeded
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("dp_noisy_counts", dp_noisy_counts, DP_NOISY_SQL)
    register("k_anonymity_census", k_anonymity_census, K_ANONYMITY_SQL)
    register("t_closeness_census", t_closeness_census, T_CLOSENESS_SQL)
    register("l_diversity_census", l_diversity_census, L_DIVERSITY_SQL)
    register("containment_pairs", containment_pairs, CONTAINMENT_SQL)
    register("dow_seasonality_events", dow_seasonality_events, DOW_SEASONALITY_SQL)
