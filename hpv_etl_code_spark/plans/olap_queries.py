"""Skyline, bitmap-distinct, TWAP, Welch-t and PSI-drift entries.

OLAP/statistics operator families with distinct optimizer/scale shapes
not exercised elsewhere in the catalog (see also ``ab_welch_ttest`` —
the A/B readout — and ``psi_value_drift`` — the drift monitor — defined
below with their own docstrings):

- ``skyline_parts`` — the Pareto frontier (skyline) query: parts no
  other part beats on BOTH price (maximize) and size (minimize). The
  naive formulation is a quadratic self-theta-join; the distributed
  textbook shape is shrink-then-refine, realized here declaratively:
  collapse to per-price minima (hash agg), range-bucket the price
  levels, resolve dominance with bucket-partitioned windows plus a
  metadata-sized cross-bucket prefix — the same two-phase idiom as
  ``operators/layout.py::global_row_index`` — then broadcast the
  (provably tiny) surviving frontier back onto the base table.
- ``bitmap_distinct_events`` — exact distinct counting through 63-bit
  bitmap words (the bitmap-index technique behind roaring-bitmap
  COUNT(DISTINCT) in ClickHouse/Druid): distinct user counts shuffle as
  |universe|/63 OR-able words instead of raw ids, stay mergeable across
  partitions/time-slices, and popcount out exactly. The exact
  ``count(distinct)`` rides along so the entry certifies the bitmap
  arithmetic end-to-end (bits 0..62 only: ``1::BIGINT << 63`` overflows
  DuckDB and flips the sign bit in two's-complement engines).
- ``twap_events`` — time-weighted average over an irregular event
  series (the TWAP/telemetry-averaging primitive): each observation
  weighted by its holding time until the next event. The lead window,
  the weighted sums and the final per-user aggregate all cluster by
  ``user_id`` — ONE planned exchange, same single-exchange chain as
  ``sessionize_events``. Weighted sums go through exact decimals
  (``functions/numeric.py`` discipline): DECIMAL(20,8) × integer
  seconds is exact, so the sum is order-independent and the oracle
  matches bit-for-bit.

The reference engine has none of these (a 205-line pandas Excel
pipeline, `/root/reference/src/main.py`); they are north-star extension
surface like the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

SKYLINE_BUCKETS = 32
BITMAP_WORD_BITS = 63  # bits 0..62 — bit 63 is the sign bit / DuckDB overflow


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of ``part``: maximize ``p_retailprice``,
    minimize ``p_size``. A part is dominated iff some other part is at
    least as good on both dimensions and strictly better on one.

    Shrink-then-refine, never the quadratic self-join:

    1. SHRINK — collapse to price levels: per distinct price, the best
       (minimum) size. Hash aggregation; at 100 TB this is the big
       reduction (|distinct prices| ≪ |rows|).
    2. BUCKET — range-bucket the price levels (``width_bucket`` over
       broadcast min/max bounds). Dominance along the price axis then
       decomposes: a price level is beaten either by a higher price in
       its OWN bucket (bucket-partitioned running-min window, parallel)
       or by ANY price in a strictly higher bucket (running min over
       the ≤``SKYLINE_BUCKETS``-row bucket-minimum table — the only
       single-partition step, metadata-sized by construction).
    3. REFINE — surviving price levels (the frontier is provably small:
       one survivor per distinct price at most, strictly decreasing
       size) broadcast-join back to ``part`` to emit every part sitting
       exactly on the frontier (same-price-same-size ties all survive:
       neither strictly beats the other).
    """
    # Rows with NULL in either dimension are incomparable and excluded
    # from both sides (as candidates AND as dominators) — the oracle
    # filters identically. Without this the engines diverge: a SQL
    # NOT EXISTS vacuously KEEPS NULL-dimension rows (every comparison
    # is NULL), while the frontier equality join-back drops them.
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
    )
    levels = part.groupBy("p_retailprice").agg(
        F.min("p_size").alias("best_size")
    )
    bounds = levels.agg(
        F.min("p_retailprice").alias("__lo"), F.max("p_retailprice").alias("__hi")
    )
    bucketed = levels.join(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.width_bucket(
            F.col("p_retailprice"),
            F.col("__lo"),
            F.col("__hi") + 1,
            F.lit(SKYLINE_BUCKETS),
        ),
    ).drop("__lo", "__hi")

    # min best_size among all price levels in STRICTLY higher buckets:
    # a running min over the bucket-minimum table, ordered by bucket
    # descending (metadata-sized — ≤ SKYLINE_BUCKETS rows)
    above = (
        bucketed.groupBy("__bucket")
        .agg(F.min("best_size").alias("__bmin"))
        .withColumn(
            "__above",
            F.min("__bmin").over(
                Window.orderBy(F.desc("__bucket")).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("__bucket", "__above")
    )

    # min best_size among strictly higher prices in the SAME bucket —
    # partitioned by bucket, so every data-sized window runs in parallel
    # (prices are distinct post-shrink, so the rows frame is exactly the
    # strictly-higher-price set)
    in_bucket = F.min("best_size").over(
        Window.partitionBy("__bucket")
        .orderBy(F.desc("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        bucketed.join(F.broadcast(above), "__bucket")
        .withColumn("__prefix", F.least(in_bucket, F.col("__above")))
        # least() skips NULLs, so __prefix is the min over every
        # strictly-higher price level, NULL only for the global max price.
        # A level survives iff nothing above it has size <= best_size.
        .filter(F.col("__prefix").isNull() | (F.col("__prefix") > F.col("best_size")))
        # rename to break lineage with part's own columns (frontier is
        # derived FROM part — without the rename the join-back is an
        # ambiguous self-reference)
        .select(
            F.col("p_retailprice").alias("__f_price"),
            F.col("best_size").alias("__f_size"),
        )
    )
    return part.join(
        F.broadcast(frontier),
        (F.col("p_retailprice") == F.col("__f_price"))
        & (F.col("p_size") == F.col("__f_size")),
    ).select("p_partkey", "p_retailprice", "p_size")


SKYLINE_PARTS_SQL = """
WITH pp AS (
  SELECT p_partkey, p_retailprice, p_size FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
)
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM pp p
WHERE NOT EXISTS (
  SELECT 1 FROM pp q
  WHERE q.p_retailprice >= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice > p.p_retailprice OR q.p_size < p.p_size)
)
"""


def bitmap_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, computed exactly through bitmap
    words: user u sets bit ``u % 63`` of word ``u DIV 63``; words OR
    together per (event_type, word); popcounts sum to the exact
    distinct count.

    Why this beats ``count(distinct)`` at 100 TB: the shuffle carries
    at most |user universe|/63 words per group (bounded, dense,
    OR-mergeable) instead of every raw id, partial aggregation combines
    words map-side, and per-day word tables can be OR-merged later into
    any coarser rollup without touching raw data — the re-aggregation
    property COUNT(DISTINCT) lacks. The exact ``count(distinct)`` rides
    along, so the oracle certifies bitmap == exact on every row.

    Precondition: ``user_id >= 0``. For negative ids Spark's DIV
    (truncate toward zero) diverges from DuckDB's ``//`` (floor) and a
    negative shift position is undefined, so both sides filter to the
    non-negative domain explicitly; ids from a signed source should be
    pre-hashed into non-negatives (e.g. ``abs(xxhash64(id))``).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .filter(F.col("user_id") >= 0)
    )
    words = (
        ev.select(
            "event_type",
            F.expr(f"user_id DIV {BITMAP_WORD_BITS}").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {BITMAP_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("event_type", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    per_type = words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("bitmap_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return per_type.join(exact, "event_type").select(
        "event_type", "bitmap_distinct", "n_words", "exact_distinct"
    )


BITMAP_DISTINCT_SQL = f"""
WITH w AS (
  SELECT event_type, user_id // {BITMAP_WORD_BITS} AS word_idx,
         bit_or(1::BIGINT << (user_id % {BITMAP_WORD_BITS})::INT) AS word
  FROM events WHERE user_id >= 0 GROUP BY 1, 2
), b AS (
  SELECT event_type, SUM(bit_count(word))::BIGINT AS bitmap_distinct,
         COUNT(*)::BIGINT AS n_words
  FROM w GROUP BY 1
), x AS (
  SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events WHERE user_id >= 0 GROUP BY 1
)
SELECT event_type, bitmap_distinct, n_words, exact_distinct
FROM b JOIN x USING (event_type)
"""


def twap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value``: each observation
    holds until the user's next event and is weighted by that holding
    time (the TWAP primitive of telemetry/market pipelines — a plain
    ``avg`` over-weights bursts of rapid-fire events).

    The lead window, both weighted sums and the grouping all cluster by
    ``user_id``, so Catalyst plans ONE hash exchange for the whole
    chain (same shape as ``sessionize_events``). Each user's last event
    has no holding time and drops out of both sums (NULL-skipping sum,
    identical in the oracle); single-event users yield NULL, and a user
    whose events all land in one SECOND (sum dt = 0 — second-truncated
    timestamps) also yields NULL via an explicit guard: Spark 4 runs
    ANSI mode by default, where a bare /0 RAISES instead of
    NULLing, and DuckDB would return inf — the guard is the only
    formulation both engines agree on. Weighted
    sums follow the exact-decimal discipline: DECIMAL(20,8) value ×
    integer seconds is exact, so the shuffle-order-independent sum
    converts to the same IEEE double on both engines. Ties on ``ts``
    break by ``event_id`` in both engines, making lead() deterministic.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("at"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("at", "event_id")
    dt = (F.lead("at").over(w) - F.col("at")).alias("dt")
    held = ev.select("user_id", "value", dt)
    return (
        held.groupBy("user_id")
        .agg(
            F.sum("dt").alias("held_secs"),
            F.when(
                F.sum("dt") > 0,
                F.sum(
                    F.col("value").cast("decimal(20,8)") * F.col("dt")
                ).cast("double")
                / F.sum("dt"),
            ).alias("twap_raw"),
        )
        .select(
            "user_id",
            "held_secs",
            F.round("twap_raw", 6).alias("twap_value"),
        )
    )


TWAP_EVENTS_SQL = """
WITH h AS (
  SELECT user_id, value,
         lead(FLOOR(epoch(ts))::BIGINT) OVER
           (PARTITION BY user_id ORDER BY FLOOR(epoch(ts))::BIGINT, event_id)
           - FLOOR(epoch(ts))::BIGINT AS dt
  FROM events
)
SELECT user_id, SUM(dt)::BIGINT AS held_secs,
       ROUND(CASE WHEN SUM(dt) > 0 THEN
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,8)) * dt) AS VARCHAR) AS DOUBLE)
             / SUM(dt) END, 6) AS twap_value
FROM h GROUP BY user_id
"""


def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test of ``value`` per event type — the A/B
    experiment readout (unequal variances, unequal n). Arms are a
    deterministic 50/50 portable-md5 split of ``user_id`` (same hash
    family as ``split_assign`` — subset-invariant, re-runnable,
    engine-reproducible, unlike any RNG split).

    One grouped pass collects the sufficient statistics (n, Σx, Σx²)
    per (event_type, arm) — Σx and Σx² through exact decimals
    (DECIMAL(12,2) inputs ⇒ DECIMAL(25,4) squares, both summed
    exactly), so the moments are shuffle-order-independent; a second
    metadata-sized pivot puts both arms on one row and the t statistic
    and Welch–Satterthwaite df are pure double arithmetic written
    identically in the oracle. At 100 TB: one partial-agg exchange on
    (event_type, arm); everything after is per-group scalar math.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    arm = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(2),
    )
    vdec = F.col("value").cast("decimal(12,2)")
    per_arm = (
        ev.withColumn("arm", arm)
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(vdec).cast("double").alias("sx"),
            F.sum(vdec * vdec).cast("double").alias("sxx"),
        )
    )

    def pick(col: str, a: int):
        return F.max(F.when(F.col("arm") == a, F.col(col))).alias(f"{col}{a}")

    wide = per_arm.groupBy("event_type").agg(
        pick("n", 0), pick("sx", 0), pick("sxx", 0),
        pick("n", 1), pick("sx", 1), pick("sxx", 1),
    )
    # Degenerate guards (Spark 4 runs ANSI mode: a bare /0 RAISES):
    # an arm with ≤1 row has no sample variance → NULL propagates
    # through se2/t/df; two zero-variance arms → se2 = 0 → NULL t.
    m0 = F.col("sx0") / F.col("n0")
    m1 = F.col("sx1") / F.col("n1")
    v0 = F.when(
        F.col("n0") > 1,
        (F.col("sxx0") - F.col("sx0") * F.col("sx0") / F.col("n0"))
        / (F.col("n0") - 1),
    )
    v1 = F.when(
        F.col("n1") > 1,
        (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
        / (F.col("n1") - 1),
    )
    se2 = v0 / F.col("n0") + v1 / F.col("n1")
    t = F.when(se2 > 0, (m1 - m0) / F.sqrt(se2))
    den = (v0 / F.col("n0")) * (v0 / F.col("n0")) / (F.col("n0") - 1) + (
        v1 / F.col("n1")
    ) * (v1 / F.col("n1")) / (F.col("n1") - 1)
    dof = F.when(den > 0, (se2 * se2) / den)
    return wide.select(
        "event_type",
        F.col("n0").alias("n_a"),
        F.col("n1").alias("n_b"),
        F.round(m0, 6).alias("mean_a"),
        F.round(m1, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_df"),
    )


AB_WELCH_SQL = """
WITH per_arm AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm,
         COUNT(*)::BIGINT AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
              AS VARCHAR) AS DOUBLE) AS sxx
  FROM events GROUP BY 1, 2
), wide AS (
  SELECT event_type,
         MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
         MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
         MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM per_arm GROUP BY 1
), vg AS (
  SELECT event_type, n0, sx0, n1, sx1,
    CASE WHEN n0 > 1 THEN (sxx0 - sx0 * sx0 / n0) / (n0 - 1) END AS v0,
    CASE WHEN n1 > 1 THEN (sxx1 - sx1 * sx1 / n1) / (n1 - 1) END AS v1
  FROM wide
)
SELECT event_type, n0 AS n_a, n1 AS n_b,
       round(sx0 / n0, 6) AS mean_a,
       round(sx1 / n1, 6) AS mean_b,
       round(CASE WHEN v0 / n0 + v1 / n1 > 0 THEN
             (sx1 / n1 - sx0 / n0) / sqrt(v0 / n0 + v1 / n1) END, 6) AS t_stat,
       round(CASE WHEN (v0 / n0) * (v0 / n0) / (n0 - 1)
                     + (v1 / n1) * (v1 / n1) / (n1 - 1) > 0 THEN
             (v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
             / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                + (v1 / n1) * (v1 / n1) / (n1 - 1)) END, 6) AS welch_df
FROM vg
"""


PSI_BUCKETS = 10


def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of ``events.value`` between the first
    and second half of the observed time range — the industry-standard
    training-data drift monitor (PSI < 0.1 stable, > 0.25 drifted).

    Value space is cut into ``PSI_BUCKETS`` equal-width bins over
    broadcast global bounds. Binning runs entirely in INTEGER space —
    values are exact cents (2-decimal inputs through DECIMAL(12,2)),
    bin = ((cents − lo)·B) DIV (hi − lo + 1) + 1 — so bucket membership
    is bit-identical across engines with no float-rounding seam (DuckDB
    also has no width_bucket). Each bin's share in period A vs B is
    Laplace-smoothed ((n+1)/(N+B) — keeps ln defined on empty bins
    deterministically, no epsilon constants), and the per-bin PSI term
    is (p−q)·ln(p/q). Output: one row per bin plus a TOTAL row
    (bucket = −1) whose sum goes through exact decimals so it is
    shuffle-order-independent.

    Scale shape: two 1-row broadcast aggregates (bounds+midpoint,
    period totals) and ONE grouped count pass over the fact; everything
    downstream is arithmetic on ≤ PSI_BUCKETS metadata rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
        F.unix_timestamp("ts").alias("at"),
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
                f"((cents - __lo) * {PSI_BUCKETS}) DIV (__hi - __lo + 1) + 1"
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
    totals = counted.agg(
        F.sum("n_a").alias("__ta"), F.sum("n_b").alias("__tb")
    )
    p = (F.col("n_a") + 1) / (F.col("__ta") + PSI_BUCKETS)
    q = (F.col("n_b") + 1) / (F.col("__tb") + PSI_BUCKETS)
    terms = (
        counted.join(F.broadcast(totals))
        .withColumn("__term", (p - q) * F.log(p / q))
        .select("bucket", "n_a", "n_b", "__term")
    )
    per_bucket = terms.select(
        "bucket", "n_a", "n_b", F.round("__term", 6).alias("psi_term")
    )
    total = terms.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.round(
            F.sum(F.col("__term").cast("decimal(20,8)")).cast("double"), 6
        ).alias("psi_term"),
    )
    return per_bucket.unionByName(total)


PSI_DRIFT_SQL = f"""
WITH ev AS (
  SELECT (CAST(value AS DECIMAL(12,2)) * 100)::BIGINT AS cents,
         FLOOR(epoch(ts))::BIGINT AS at
  FROM events
), bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi,
         MIN(at) AS t0, MAX(at) AS t1 FROM ev
), counted AS (
  SELECT ((cents - lo) * {PSI_BUCKETS}) // (hi - lo + 1) + 1 AS bucket,
         SUM(CASE WHEN at <= (t0 + t1) // 2 THEN 1 ELSE 0 END)::BIGINT AS n_a,
         SUM(CASE WHEN at > (t0 + t1) // 2 THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM ev, bounds GROUP BY 1
), totals AS (
  SELECT SUM(n_a)::BIGINT AS ta, SUM(n_b)::BIGINT AS tb FROM counted
), terms AS (
  SELECT bucket, n_a, n_b,
    ((n_a + 1)::DOUBLE / (ta + {PSI_BUCKETS}) - (n_b + 1)::DOUBLE / (tb + {PSI_BUCKETS}))
      * ln(((n_a + 1)::DOUBLE / (ta + {PSI_BUCKETS}))
           / ((n_b + 1)::DOUBLE / (tb + {PSI_BUCKETS}))) AS term
  FROM counted, totals
)
SELECT bucket, n_a, n_b, round(term, 6) AS psi_term FROM terms
UNION ALL
SELECT -1::BIGINT AS bucket, SUM(n_a)::BIGINT, SUM(n_b)::BIGINT,
       round(CAST(CAST(SUM(CAST(term AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE), 6)
FROM terms
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register("skyline_parts", skyline_parts, SKYLINE_PARTS_SQL)
    register("bitmap_distinct_events", bitmap_distinct_events, BITMAP_DISTINCT_SQL)
    register("twap_events", twap_events, TWAP_EVENTS_SQL)
    register("ab_welch_ttest", ab_welch_ttest, AB_WELCH_SQL)
    register("psi_value_drift", psi_value_drift, PSI_DRIFT_SQL)
