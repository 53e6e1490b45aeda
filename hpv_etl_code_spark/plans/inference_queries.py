"""Inference-style analytics entries (round 5, session 3): closed-form
OLS regression per group via exact-decimal normal equations, and
Shannon token entropy per corpus slice.

Both follow the repo determinism contract (``functions/numeric.py``):
every aggregate runs in EXACT integer/decimal space (order-independent
across shuffles), and floats appear only in a single fixed IEEE op
chain mirrored verbatim in the DuckDB oracle, rounded to 6dp.

Reference parity note: the reference (src/main.py) has no statistics
surface at all — these are north-star extension entries for the
training-data-pipeline use case (feature trends, corpus balance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

# Epoch for the day-offset regressor: the corpus's first order date.
_OLS_EPOCH = "1995-01-01"


def ols_segment_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment OLS trend of order value over time — slope /
    intercept / R² of ``o_totalprice`` (cents) against the day offset
    from the corpus epoch, via the closed-form normal equations.

    Determinism: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) are EXACT — x is an integer day offset, y integer cents, and
    the product sums go through DECIMAL(38,0) (DuckDB's BIGINT sums
    promote to exact HUGEINT), so they are shuffle-order-independent.
    Only then does one fixed IEEE chain produce slope =
    (n·Σxy − Σx·Σy)/(n·Σx² − Σx·Σx), intercept = (Σy − slope·Σx)/n and
    R² = (n·Σxy − Σx·Σy)² / ((n·Σx² − Σx·Σx)(n·Σy² − Σy·Σy)) — the
    oracle repeats the identical op tree, so both engines emit the same
    double before the 6dp round. Zero-variance groups yield NULL via
    the same CASE guard in both (Spark 4 ANSI division).

    Scale: broadcast dim join (customer is the small side) + ONE hash
    aggregation with map-side partials; the chain runs on ≤|segments|
    metadata rows. Sufficient statistics are mergeable, so the same
    plan serves incremental refresh (add partial sums per batch).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == customer.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.datediff(F.col("o_orderdate"), F.lit(_OLS_EPOCH).cast("date"))
        .cast("bigint")
        .alias("x"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    return ols_trend(j)


def ols_trend(j: DataFrame) -> DataFrame:
    """OLS over a (segment, x, y) frame — exact-decimal sufficient
    statistics + the fixed IEEE chain (see :func:`ols_segment_trend`).
    Split out so the STREAMING path can reuse it verbatim: the
    statistics are plain mergeable sums, i.e. a native Structured
    Streaming aggregation (complete mode), no custom state — the
    stream ≡ batch equality is locked in tests/test_streaming_ols.py.
    """
    g = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    cov_n = nd * sxyd - sxd * syd
    varx_n = nd * sxxd - sxd * sxd
    vary_n = nd * syyd - syd * syd
    slope = F.when(varx_n != 0, cov_n / varx_n)
    return g.select(
        "segment",
        F.col("n").alias("n_orders"),
        F.round(slope, 6).alias("slope_cents_per_day"),
        F.round(
            F.when(varx_n != 0, (syd - (cov_n / varx_n) * sxd) / nd), 6
        ).alias("intercept_cents"),
        F.round(
            F.when(
                (varx_n != 0) & (vary_n != 0),
                (cov_n * cov_n) / (varx_n * vary_n),
            ),
            6,
        ).alias("r2"),
        F.round(syd / nd, 6).alias("mean_cents"),
    )


OLS_SEGMENT_TREND_SQL = f"""
WITH j AS (
  SELECT c_mktsegment AS segment,
         date_diff('day', TIMESTAMP '{_OLS_EPOCH}', o_orderdate)::BIGINT AS x,
         (CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
), g AS (
  SELECT segment, COUNT(*)::BIGINT AS n,
         SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         SUM(x * y)::DOUBLE AS sxy, SUM(x * x)::DOUBLE AS sxx,
         SUM(y * y)::DOUBLE AS syy
  FROM j GROUP BY 1
), c AS (
  SELECT segment, n, sx::DOUBLE AS sxd, sy::DOUBLE AS syd, sxy, sxx, syy,
         n::DOUBLE * sxy - sx::DOUBLE * sy::DOUBLE AS cov_n,
         n::DOUBLE * sxx - sx::DOUBLE * sx::DOUBLE AS varx_n,
         n::DOUBLE * syy - sy::DOUBLE * sy::DOUBLE AS vary_n
  FROM g
)
SELECT segment, n AS n_orders,
  ROUND(CASE WHEN varx_n <> 0 THEN cov_n / varx_n END, 6)
    AS slope_cents_per_day,
  ROUND(CASE WHEN varx_n <> 0
             THEN (syd - (cov_n / varx_n) * sxd) / n::DOUBLE END, 6)
    AS intercept_cents,
  ROUND(CASE WHEN varx_n <> 0 AND vary_n <> 0
             THEN (cov_n * cov_n) / (varx_n * vary_n) END, 6) AS r2,
  ROUND(syd / n::DOUBLE, 6) AS mean_cents
FROM c
"""


def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per document source —
    the corpus-balance diagnostic (low entropy = repetitive/templated
    slice; normalized entropy compares slices with different vocab).

    H = ln(N) − (Σ c·ln c)/N over per-(source, token) counts c. Each
    term is one int→double conversion, one ln, one multiply (identical
    in both engines); the term SUM — the only order-sensitive step —
    goes through DECIMAL(20,8) (PSI-total pattern,
    ``olap_queries.psi_value_drift``), so the final H chain sees
    identical operands in both engines.

    Scale: explode → ONE (source, token) hash aggregation with partial
    counts → source-sized agg. Per-token counts are mergeable across
    batches; vocab-sized state only.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cd = F.col("c").cast("double")
    term = cd * F.log(cd)
    per_src = counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(term.cast("decimal(20,8)")).cast("double").alias("__s"),
    )
    nd = F.col("n_tokens").cast("double")
    h = F.log(nd) - F.col("__s") / nd
    return per_src.select(
        "source",
        "n_tokens",
        "vocab",
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(
                F.col("vocab") > 1, h / F.log(F.col("vocab").cast("double"))
            ),
            6,
        ).alias("norm_entropy"),
    )


TOKEN_ENTROPY_SQL = """
WITH counts AS (
  SELECT source, tok, COUNT(*)::BIGINT AS c FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
  ) GROUP BY 1, 2
), s AS (
  SELECT source, SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS vocab,
    CAST(CAST(SUM(CAST(c::DOUBLE * ln(c::DOUBLE) AS DECIMAL(20,8)))
         AS VARCHAR) AS DOUBLE) AS sterm
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, vocab,
  ROUND(ln(n_tokens::DOUBLE) - sterm / n_tokens::DOUBLE, 6) AS entropy,
  ROUND(CASE WHEN vocab > 1 THEN
        (ln(n_tokens::DOUBLE) - sterm / n_tokens::DOUBLE)
        / ln(vocab::DOUBLE) END, 6) AS norm_entropy
FROM s
"""


def register_entries(register) -> None:  # noqa: ANN001 — see catalog.register
    register("ols_segment_trend", ols_segment_trend, OLS_SEGMENT_TREND_SQL)
    register(
        "token_entropy_by_source", token_entropy_by_source, TOKEN_ENTROPY_SQL
    )
