"""Catalog entries for the data-quality gate and deterministic splits."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    SPLIT_DENOM,
    _portable_bucket,
    data_quality_report,
    split_assign,
)
from ..sources.registry import load_table


def dq_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations gate over orders+lineitem: nulls, key uniqueness,
    lineitem→orders referential integrity, and a price range check."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return data_quality_report(
        li,
        not_null=("l_orderkey", "l_quantity"),
        unique_key=("l_orderkey", "l_linenumber"),
        fk=(("l_orderkey", o, "o_orderkey"),),
        ranges=(("l_discount", 0.0, 0.1),),
    )


DQ_REPORT_SQL = """
SELECT 'not_null:l_orderkey' AS check_name,
       SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_violations
FROM lineitem
UNION ALL
SELECT 'not_null:l_quantity',
       SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT
FROM lineitem
UNION ALL
SELECT 'range:l_discount',
       SUM(CASE WHEN l_discount IS NOT NULL
                 AND (l_discount < 0.0 OR l_discount > 0.1)
            THEN 1 ELSE 0 END)::BIGINT
FROM lineitem
UNION ALL
SELECT 'unique:l_orderkey,l_linenumber',
       COALESCE(SUM(n - 1), 0)::BIGINT
FROM (SELECT COUNT(*) AS n FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
UNION ALL
SELECT 'fk:l_orderkey', COUNT(*)::BIGINT
FROM lineitem l
WHERE l.l_orderkey IS NOT NULL
  AND l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


def split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split row counts of the deterministic doc split — the sanity
    report a training pipeline logs before writing shards."""
    d = load_table(spark, sf_dir, "documents")
    return (
        split_assign(d, "doc_id", val_frac=0.05, test_frac=0.05)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SPLIT_SQL = f"""
WITH b AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % {SPLIT_DENOM}
         AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < {int(0.05 * SPLIT_DENOM)} THEN 'val'
            WHEN bucket < {2 * int(0.05 * SPLIT_DENOM)} THEN 'test'
            ELSE 'train' END AS split,
       COUNT(*) AS n_docs
FROM b GROUP BY 1
"""


def reconcile_orders_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation demo: diff orders against a
    deterministically drifted copy (keys ≡0 mod 101 dropped, status
    rewritten for keys ≡0 mod 97, keys ≡0 mod 499 re-added shifted) and
    report per-class counts — the audit a CDC pipeline runs after every
    merge window."""
    from ..operators.reconcile import diff_summary

    o = load_table(spark, sf_dir, "orders")
    drifted = (
        o.filter(F.pmod("o_orderkey", F.lit(101)) != 0)
        .withColumn(
            "o_orderstatus",
            F.when(
                F.pmod("o_orderkey", F.lit(97)) == 0, F.lit("X")
            ).otherwise(F.col("o_orderstatus")),
        )
        .unionByName(
            o.filter(F.pmod("o_orderkey", F.lit(499)) == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 10_000_000
            )
        )
    )
    return diff_summary(
        o, drifted, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


RECONCILE_SQL = """
WITH drifted AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 499 = 0
), j AS (
  SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS k,
    CASE WHEN l.o_orderkey IS NULL THEN 'added'
         WHEN r.o_orderkey IS NULL THEN 'removed'
         WHEN l.o_orderstatus IS NOT DISTINCT FROM r.o_orderstatus
          AND l.o_totalprice IS NOT DISTINCT FROM r.o_totalprice
           THEN 'unchanged'
         ELSE 'changed' END AS change_type
  FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) l
  FULL OUTER JOIN drifted r ON l.o_orderkey = r.o_orderkey
)
SELECT change_type, COUNT(*) AS n FROM j GROUP BY change_type
"""


STRATUM_K = 50


def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sample (the distributed reservoir): rank
    rows inside each event type by a portable hash of the id and keep
    the first k — deterministic across retries/engines, balanced across
    strata regardless of their sizes (a plain Bernoulli sample starves
    rare strata). One keyed window; WindowGroupLimit prunes before the
    full sort."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    b = _portable_bucket(F.col("event_id"), denom=SPLIT_DENOM)
    w = Window.partitionBy("event_type").orderBy(
        b.asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_K)
        .select("event_id", "event_type", "user_id", "value")
    )


STRATIFIED_SQL = f"""
SELECT event_id, event_type, user_id, value
FROM (
  SELECT event_id, event_type, user_id, value,
    ROW_NUMBER() OVER (
      PARTITION BY event_type
      ORDER BY ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT
               % {SPLIT_DENOM}, event_id
    ) AS rn
  FROM events
)
WHERE rn <= {STRATUM_K}
"""




def feature_scaling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization — the three scalers every
    training-data pipeline applies before modeling: min-max to [0,1],
    z-score (exact-decimal moments, Welch-style sufficient statistics),
    and percent_rank. All per ``event_type``.

    Scale shape: ONE grouped pass collects (n, min, max, Σx, Σx²) per
    group — metadata-sized, broadcast back onto the never-shuffled
    fact for the arithmetic scalers; percent_rank is the one
    genuinely rank-based scaler and clusters by the same key (its
    window is the plan's only fact exchange). Degenerate groups
    (constant value → zero range/variance) yield NULL rather than a
    division blow-up, identically in the oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    vdec = F.col("value").cast("decimal(12,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum(vdec).cast("double").alias("sx"),
        F.sum(vdec * vdec).cast("double").alias("sxx"),
    )
    # n > 1 guard REQUIRED (not just var > 0): Spark 4's ANSI mode
    # raises on /0, and a when() condition still evaluates the
    # division inside it — a single-row group would crash the query
    var = F.when(
        F.col("n") > 1,
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1),
    )
    mean = F.col("sx") / F.col("n")
    minmax = F.when(
        F.col("hi") != F.col("lo"),
        (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")),
    )
    zscore = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var))
    pr = F.percent_rank().over(
        Window.partitionBy("event_type").orderBy("value")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(minmax, 6).alias("minmax"),
            F.round(zscore, 6).alias("zscore"),
            F.round(pr, 6).alias("pct_rank"),
        )
    )


FEATURE_SCALING_SQL = """
WITH stats AS (
  SELECT event_type, COUNT(*)::BIGINT AS n,
         MIN(value) AS lo, MAX(value) AS hi,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
              AS VARCHAR) AS DOUBLE) AS sxx
  FROM events GROUP BY 1
), stats2 AS (
  SELECT *, CASE WHEN n > 1 THEN (sxx - sx * sx / n) / (n - 1) END AS var
  FROM stats
)
SELECT e.event_id, e.event_type, e.value,
  round(CASE WHEN hi <> lo THEN (value - lo) / (hi - lo) END, 6) AS minmax,
  round(CASE WHEN var > 0
        THEN (value - sx / n) / sqrt(var) END, 6) AS zscore,
  round(percent_rank() OVER (PARTITION BY e.event_type ORDER BY value), 6)
    AS pct_rank
FROM events e JOIN stats2 USING (event_type)
"""



_FD_CANDIDATES = (
    # (name, determinant, dependent) — candidates a profiler must judge
    # with evidence. Note: on this synthetic corpus even the
    # composite-key candidate FAILS (duplicate (orderkey, linenumber)
    # pairs carry different quantities) — exactly the kind of
    # key-assumption break the profiler exists to surface before a
    # pipeline dedupes or merges on a phantom key.
    ("orderkey,linenumber->quantity", ("l_orderkey", "l_linenumber"), "l_quantity"),
    ("orderkey->returnflag", ("l_orderkey",), "l_returnflag"),
    ("partkey->suppkey", ("l_partkey",), "l_suppkey"),
)


def fd_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling: for each candidate X → Y,
    measure how badly it fails — the metadata-discovery primitive
    behind schema inference, key detection and normalization advice.

    Per candidate, one grouped pass computes (groups, violating groups
    where count(distinct Y) > 1, total excess distinct values); an FD
    HOLDS iff violations are zero. Exact integer counts (bit-stable in
    the oracle); each candidate is a single partial-aggregated shuffle
    on its determinant — the same cost as any grouped count, whatever
    the table size."""
    li = load_table(spark, sf_dir, "lineitem")
    frames = []
    for name, det, dep in _FD_CANDIDATES:
        g = li.groupBy(*det).agg(F.countDistinct(dep).alias("ndv"))
        frames.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum((F.col("ndv") > 1).cast("long")).alias("n_violating"),
                F.sum(F.col("ndv") - 1).cast("long").alias("excess_values"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _fd_sql() -> str:
    parts = []
    for name, det, dep in _FD_CANDIDATES:
        det_cols = ", ".join(det)
        parts.append(f"""
SELECT '{name}' AS fd, COUNT(*)::BIGINT AS n_groups,
       SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       SUM(ndv - 1)::BIGINT AS excess_values
FROM (SELECT {det_cols}, COUNT(DISTINCT {dep}) AS ndv
      FROM lineitem GROUP BY {det_cols})""")
    return "\nUNION ALL\n".join(parts)


FD_PROFILE_SQL = _fd_sql()


_QNORM_BUCKETS = 10


def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source document-length
    distributions onto the pooled corpus distribution — the batch-effect
    remover (each source's rank-r value maps to the pooled order
    statistic at the proportional rank ⌈r·n_pool/n_s⌉), reported as a
    per-(source, decile) summary of raw vs normalized mean length so
    the correction itself is auditable.

    Determinism: both rankings break ties by doc_id; the proportional
    index is exact integer arithmetic ((r·n_pool + n_s − 1) DIV n_s);
    means are decimal sums over bigint lengths with one final division.

    Scale: the per-source rank is a partition-parallel window; the
    POOLED rank uses `operators/layout.global_row_index` (bucketed
    two-phase numbering — no single-partition sort); the map is one
    equi-join on the integer index (shuffle bounded by |docs|), and the
    output is sources × 10 summary rows.
    """
    from ..operators.layout import global_row_index

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    pooled = global_row_index(
        docs, key="n_chars", index_col="pool_rank", tiebreak=("doc_id",)
    ).select(F.col("pool_rank").alias("k"), F.col("n_chars").alias("norm_chars"))
    n_pool = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pool"))
    from pyspark.sql import Window

    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = (
        docs.withColumn("r", F.row_number().over(w_src).cast("bigint"))
        .withColumn(
            "n_s",
            F.count(F.lit(1))
            .over(Window.partitionBy("source"))
            .cast("bigint"),
        )
        .join(F.broadcast(n_pool))
        .withColumn(
            "k",
            F.expr("(r * n_pool + n_s - 1) DIV n_s"),
        )
    )
    mapped = ranked.join(pooled, "k")
    decile = F.expr(f"((r - 1) * {_QNORM_BUCKETS}) DIV n_s").cast("bigint")
    return (
        mapped.groupBy("source", decile.alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(20,8)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_raw"),
            F.round(
                F.sum(F.col("norm_chars").cast("decimal(20,8)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_norm"),
        )
    )


QNORM_SQL = f"""
WITH docs AS (
  SELECT doc_id, source, n_chars::BIGINT AS n_chars FROM documents
), pooled AS (
  SELECT row_number() OVER (ORDER BY n_chars, doc_id) AS k,
         n_chars AS norm_chars
  FROM docs
), n1 AS (SELECT COUNT(*)::BIGINT AS n_pool FROM docs),
ranked AS (
  SELECT source, n_chars,
    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)::BIGINT
      AS r,
    (COUNT(*) OVER (PARTITION BY source))::BIGINT AS n_s,
    n_pool
  FROM docs CROSS JOIN n1
)
SELECT source,
  (((r - 1) * {_QNORM_BUCKETS}) // n_s)::BIGINT AS decile,
  COUNT(*)::BIGINT AS n_docs,
  ROUND(CAST(CAST(SUM(CAST(ranked.n_chars AS DECIMAL(20,8)))
        AS VARCHAR) AS DOUBLE) / COUNT(*)::DOUBLE, 6) AS mean_raw,
  ROUND(CAST(CAST(SUM(CAST(p.norm_chars AS DECIMAL(20,8)))
        AS VARCHAR) AS DOUBLE) / COUNT(*)::DOUBLE, 6) AS mean_norm
FROM ranked JOIN pooled p ON p.k = (r * n_pool + n_s - 1) // n_s
GROUP BY 1, 2
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("dq_report_orders", dq_report_orders, DQ_REPORT_SQL)
    register(
        "quantile_normalize_sources", quantile_normalize_sources, QNORM_SQL
    )
    register(
        "feature_scaling_battery", feature_scaling_battery, FEATURE_SCALING_SQL
    )
    register("fd_profile_lineitem", fd_profile_lineitem, FD_PROFILE_SQL)
    register("split_documents", split_documents, SPLIT_SQL)
    register("reconcile_orders_drift", reconcile_orders_drift, RECONCILE_SQL)
    register(
        "stratified_sample_events", stratified_sample_events, STRATIFIED_SQL
    )
