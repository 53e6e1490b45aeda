"""Function/aggregate battery entries — wide but shallow coverage of the
remaining free Spark surface (SURVEY §2.4 'not present' list + §2.5
extensions), each with a DuckDB twin.

Determinism notes: stddev/variance are computed from exact decimal sums
(sqrt of exact rational → same double both engines) rather than the
built-in streaming estimators, whose accumulation order is engine- and
partition-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rangejoin import proximity_self_join
from ..sources.registry import load_table


def agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count-distinct/avg + deterministic sample stddev per
    order status (stddev from exact decimal moments)."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(20,8)")
    n = F.count(F.lit(1))
    s1 = F.sum(dec).cast("double")
    s2 = F.sum((dec * dec).cast("decimal(38,8)")).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return o.groupBy("o_orderstatus").agg(
        n.alias("n"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.sqrt(var), 4).alias("stddev_price"),
    )


AGG_BATTERY_SQL = """
SELECT o_orderstatus,
  COUNT(*) AS n,
  COUNT(DISTINCT o_custkey) AS n_customers,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  ROUND(sqrt(
    (CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(20,8)) * CAST(o_totalprice AS DECIMAL(20,8)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE)
     - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE)
       * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) / COUNT(*))
    / (COUNT(*) - 1)), 4) AS stddev_price
FROM orders GROUP BY o_orderstatus
"""


def date_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic battery: year/month/day extraction, date_add,
    datediff against a fixed anchor, day-of-week."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.dayofweek(d).alias("dow"),
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey,
  EXTRACT(year FROM o_orderdate)::INT AS y,
  EXTRACT(month FROM o_orderdate)::INT AS m,
  EXTRACT(day FROM o_orderdate)::INT AS d,
  (o_orderdate::DATE + INTERVAL 30 DAY)::DATE AS due_date,
  datediff('day', o_orderdate::DATE, DATE '2000-01-01')::INT AS days_to_y2k,
  dayofweek(o_orderdate)::INT + 1 AS dow
FROM orders
"""


def null_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: coalesce/nullif/greatest/least/CASE over a
    column with injected NULLs (acctbal < 0 treated as missing)."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(bal, F.lit(0.0)).alias("bal_or_zero"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.greatest(bal, F.lit(100.0)).alias("bal_floor100"),
        F.least(bal, F.lit(5000.0)).alias("bal_cap5000"),
        F.when(bal.isNull(), F.lit("missing"))
        .when(bal > 5000, F.lit("high"))
        .otherwise(F.lit("normal"))
        .alias("bal_class"),
    )


NULL_FUNCS_SQL = """
SELECT c_custkey,
  COALESCE(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 0.0) AS bal_or_zero,
  NULLIF(c_mktsegment, 'BUILDING') AS seg_nb,
  GREATEST(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 100.0) AS bal_floor100,
  LEAST(CASE WHEN c_acctbal >= 0 THEN c_acctbal END, 5000.0) AS bal_cap5000,
  CASE WHEN c_acctbal < 0 THEN 'missing'
       WHEN c_acctbal > 5000 THEN 'high' ELSE 'normal' END AS bal_class
FROM customer
"""


def array_cols() -> list:
    """Array battery projection over ``documents`` (reused by the merged
    doc_funcs_battery entry)."""
    toks = F.split("text", " ")
    return [
        F.array_contains(toks, "data").alias("has_data"),
        F.array_position(toks, "spark").alias("spark_pos"),
        # joined string, not a raw array — list-valued cells crash the
        # gate's pandas canonicalizer (round-1 lesson)
        F.array_join(
            F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3_sorted"),
        F.size(toks).alias("n"),
    ]


def array_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: contains/position/sort/slice/explode-count over
    tokenized documents."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *array_cols())


ARRAY_FUNCS_SQL = """
SELECT doc_id,
  list_contains(string_split(text, ' '), 'data') AS has_data,
  COALESCE(list_position(string_split(text, ' '), 'spark'), 0)::BIGINT AS spark_pos,
  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
    AS first3_sorted,
  len(string_split(text, ' '))::INT AS n
FROM documents
"""


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded proximity self-join: same-user event pairs within 10
    minutes (operators/rangejoin.py — equi-join + ≤3× expansion, never a
    nested-loop)."""
    ev = load_table(spark, sf_dir, "events")
    return proximity_self_join(
        ev, key="user_id", ts="ts", id_col="event_id", max_gap_seconds=600
    )


RANGE_JOIN_SQL = """
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
  abs(floor(epoch(a.ts))::BIGINT - floor(epoch(b.ts))::BIGINT) AS gap_seconds
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(floor(epoch(a.ts))::BIGINT - floor(epoch(b.ts))::BIGINT) <= 600
"""


def percentile_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile ≡ DuckDB
    quantile_cont — same continuous-interpolation semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
    )


PERCENTILE_SQL = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS median_qty,
  quantile_cont(l_quantity, 0.9) AS p90_qty,
  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price
FROM lineitem GROUP BY l_returnflag
"""


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — HyperLogLog++ count-distinct and KLL-style
    approximate percentile. Rows-only (sketch internals are engine
    specific); the exact twins above are the correctness anchor, these
    are the 100 TB path (bounded memory, one pass, mergeable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_quantity", 0.5).alias("approx_median_qty"),
    )


def corr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates — sample covariance and Pearson correlation
    of (quantity, extendedprice) per return flag — computed from EXACT
    decimal cross-moments (Σx, Σy, Σxy, Σx², Σy² as decimals, combined
    in double at the end), not the built-in streaming covar/corr whose
    accumulation order is partition-dependent. One partial-aggregable
    pass, deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(20,8)")
    y = F.col("l_extendedprice").cast("decimal(20,8)")
    n = F.count(F.lit(1))
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.sum((x * y).cast("decimal(38,8)")).cast("double")
    sxx = F.sum((x * x).cast("decimal(38,8)")).cast("double")
    syy = F.sum((y * y).cast("decimal(38,8)")).cast("double")
    cov = (sxy - sx * sy / n) / (n - F.lit(1))
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return li.groupBy("l_returnflag").agg(
        n.cast("bigint").alias("n"),
        F.round(cov, 4).alias("cov_qty_price"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


CORR_BATTERY_SQL = """
WITH m AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,8))) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,8)) * CAST(l_extendedprice AS DECIMAL(20,8)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxy,
    CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,8)) * CAST(l_quantity AS DECIMAL(20,8)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,8)) * CAST(l_extendedprice AS DECIMAL(20,8)) AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  n::BIGINT AS n,
  ROUND((sxy - sx * sy / n) / (n - 1), 4) AS cov_qty_price,
  ROUND((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    AS corr_qty_price
FROM m
"""


def kmv_distinct_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, k=64, PORTABLE hash family.

    Same one-pass / bounded-memory / mergeable scale story as HLL++ —
    per group the sketch is just the k smallest distinct 60-bit md5
    hashes (k·8 bytes, merge = union-then-keep-k-smallest, tested in
    tests/test_sketches.py) — but unlike HLL the state is exactly
    reproducible by ANY engine with md5, so it holds an oracle-checked
    slot in the driver gate window where ``approx_sketches`` (engine-
    internal HLL/KLL state) could only do a rows-only check.

    Estimator (Bar-Yossef et al. 2002): with h uniform on [0, 2^60),
    E[distinct] ≈ (k-1) · 2^60 / h_(k); exact count when < k distinct.
    All arithmetic is IEEE-754 double (exactly specified → bit-identical
    across engines), floored to BIGINT.
    """
    from pyspark.sql import Window

    k = 64
    li = load_table(spark, sf_dir, "lineitem")
    h = F.conv(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # distinct hashes per group: collisions collapse identically in both
    # engines; ordering by h is then total → deterministic row_number
    hashed = li.select("l_returnflag", h.alias("h")).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    minima = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    n = F.count(F.lit(1))
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(2**60)) / F.max("h").cast("double")
    )
    return minima.groupBy("l_returnflag").agg(
        n.cast("bigint").alias("n_minima"),
        F.max("h").alias("kth_min"),
        F.floor(est).cast("bigint").alias("est_distinct"),
    )


KMV_DISTINCT_SQL = """
WITH h AS (
  SELECT DISTINCT l_returnflag,
    ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS h
  FROM lineitem
), r AS (
  SELECT l_returnflag, h,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
  FROM h
)
SELECT l_returnflag,
  COUNT(*)::BIGINT AS n_minima,
  MAX(h) AS kth_min,
  FLOOR(CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
        ELSE 63.0 * 1152921504606846976.0 / MAX(h)::DOUBLE END)::BIGINT
    AS est_distinct
FROM r WHERE rn <= 64
GROUP BY l_returnflag
"""


def sampled_quantile_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation by BOTTOM-K uniform sampling, portable hash
    family: per event type, the 32 events with the smallest 60-bit md5
    hash of ``event_id`` form a deterministic uniform sample (the
    bottom-k trick — the SAMPLE ITSELF is mergeable: union two groups'
    bottom-k sets and keep the k smallest, same algebra as the KMV
    sketch next door), and the sample median estimates the group
    median. The exact median rides along, so the entry certifies both
    the sampling mechanics and the estimator error on real data.

    Scale story: where exact percentiles need the whole value set per
    group on one reducer (or multi-pass histograms), bottom-k carries
    k rows per group through any merge topology, re-aggregable across
    partitions/days — and unlike rand()-based sampling it is exactly
    reproducible (no RNG state, subset-invariant, engine-portable).
    WindowGroupLimit prunes the rank filter before the shuffle.

    Determinism: the sample window orders by ``(h, event_id)`` in BOTH
    engines — a duplicate event_id (or a 60-bit hash collision) at the
    k=32 boundary would otherwise make row_number engine-nondeterministic
    and flip the oracle hash.
    """
    from pyspark.sql import Window

    k = 32
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = ev.select("event_type", "value", "event_id", h.alias("h"))
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    sample = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    sample_med = sample.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.round(F.median("value"), 6).alias("sample_median"),
    )
    exact_med = ev.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("exact_median")
    )
    return sample_med.join(exact_med, "event_type").select(
        "event_type", "n_sample", "sample_median", "exact_median"
    )


SAMPLED_QUANTILE_SQL = """
WITH h AS (
  SELECT event_type, value, event_id,
    ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
), r AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
  FROM h
), s AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_sample,
         round(median(value), 6) AS sample_median
  FROM r WHERE rn <= 32 GROUP BY 1
), x AS (
  SELECT event_type, round(median(value), 6) AS exact_median
  FROM events GROUP BY 1
)
SELECT event_type, n_sample, sample_median, exact_median
FROM s JOIN x USING (event_type)
"""


def kmv_set_algebra_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA, portable hash family: distinct-count
    estimates for purchase-users (A), error-users (B), their UNION
    (merge = keep the k smallest of the combined hash sets — the
    defining mergeability of KMV) and their INTERSECTION by
    inclusion–exclusion (est_a + est_b − est_union), each next to its
    exact counterpart. This is the sketch-algebra layer on top of
    ``kmv_distinct_portable``: per-segment sketches built once can
    answer overlap/reach questions without re-touching raw data.

    Plan shape: each bottom-k is ``orderBy(h).limit(k)`` —
    TakeOrderedAndProject (per-partition heaps + merge), never a global
    sort; the three sketch summaries and two exact counts are 1-row
    aggregates combined by broadcast (the documented 1-row scalar
    idiom). Estimator arithmetic is IEEE double, floored — identical in
    the oracle."""
    k = 64
    two60 = float(2**60)
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    a_h = (
        ev.filter(F.col("event_type") == "purchase")
        .select(h.alias("h"))
        .distinct()
    )
    b_h = (
        ev.filter(F.col("event_type") == "error").select(h.alias("h")).distinct()
    )
    u_h = a_h.union(b_h).distinct()

    def sketch(df, name):
        n = F.count(F.lit(1))
        est = F.when(n < k, n.cast("double")).otherwise(
            F.lit(float(k - 1)) * F.lit(two60) / F.max("h").cast("double")
        )
        return (
            df.orderBy("h")
            .limit(k)
            .agg(F.floor(est).cast("bigint").alias(f"est_{name}"))
        )

    def exact(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(f"exact_{name}"))

    row = (
        sketch(a_h, "a")
        .join(F.broadcast(sketch(b_h, "b")))
        .join(F.broadcast(sketch(u_h, "union")))
        .join(F.broadcast(exact(a_h, "a")))
        .join(F.broadcast(exact(b_h, "b")))
        .join(F.broadcast(exact(u_h, "union")))
    )
    return row.select(
        "est_a",
        "exact_a",
        "est_b",
        "exact_b",
        "est_union",
        "exact_union",
        (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
            "est_intersection"
        ),
        (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
            "exact_intersection"
        ),
    )


KMV_SET_ALGEBRA_SQL = """
WITH a_h AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'purchase'
), b_h AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'error'
), u_h AS (
  SELECT h FROM a_h UNION SELECT h FROM b_h
), sa AS (
  SELECT FLOOR(CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
         ELSE 63.0 * 1152921504606846976.0 / MAX(h)::DOUBLE END)::BIGINT AS est_a
  FROM (SELECT h FROM a_h ORDER BY h LIMIT 64)
), sb AS (
  SELECT FLOOR(CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
         ELSE 63.0 * 1152921504606846976.0 / MAX(h)::DOUBLE END)::BIGINT AS est_b
  FROM (SELECT h FROM b_h ORDER BY h LIMIT 64)
), su AS (
  SELECT FLOOR(CASE WHEN COUNT(*) < 64 THEN COUNT(*)::DOUBLE
         ELSE 63.0 * 1152921504606846976.0 / MAX(h)::DOUBLE END)::BIGINT AS est_union
  FROM (SELECT h FROM u_h ORDER BY h LIMIT 64)
), xa AS (SELECT COUNT(*)::BIGINT AS exact_a FROM a_h
), xb AS (SELECT COUNT(*)::BIGINT AS exact_b FROM b_h
), xu AS (SELECT COUNT(*)::BIGINT AS exact_union FROM u_h)
SELECT est_a, exact_a, est_b, exact_b, est_union, exact_union,
       est_a + est_b - est_union AS est_intersection,
       exact_a + exact_b - exact_union AS exact_intersection
FROM sa, sb, su, xa, xb, xu
"""


def posexplode_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator + map-function surface: ``posexplode`` (index-preserving
    lateral explode — the position column is what ordinary ``explode``
    loses) over tokenized part names, plus a ``str_to_map`` round-trip
    (serialize two attributes to 'k=v,k=v', parse back, project keys).
    All whole-stage-codegen expressions; the oracle twin reproduces the
    explode with a DuckDB range() lateral join and checks the map
    round-trip by VALUE (parse(serialize(x))['k'] ≡ x)."""
    p = load_table(spark, sf_dir, "part")
    kv = F.str_to_map(
        F.concat(
            F.lit("brand="), F.col("p_brand"), F.lit(",type="), F.col("p_type")
        ),
        F.lit(","),
        F.lit("="),
    )
    return (
        p.select(
            "p_partkey",
            F.split("p_name", " ").alias("words"),
            kv.alias("kv"),
        )
        .select(
            "p_partkey",
            F.posexplode("words").alias("pos", "word"),
            F.col("kv")["brand"].alias("brand_parsed"),
            F.col("kv")["type"].alias("type_parsed"),
        )
    )


POSEXPLODE_MAP_SQL = """
SELECT p_partkey,
  unnest(range(len(string_split(p_name, ' '))))::INT AS pos,
  unnest(string_split(p_name, ' ')) AS word,
  p_brand AS brand_parsed,
  p_type AS type_parsed
FROM part
"""


def stack_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stack(n, ...)`` — the SQL-dialect generator twin of the
    DataFrame ``unpivot`` (R1 melt): emits one (metric, val) row per
    measure without a join or shuffle. Kept alongside ``unpivot_part``
    because SQL-surface users reach for stack/VALUES, not melt."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), "
            "'price', CAST(p_retailprice AS DOUBLE)) AS (metric, val)"
        ),
    )


STACK_UNPIVOT_SQL = """
SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS val FROM part
UNION ALL
SELECT p_partkey, 'price' AS metric, p_retailprice::DOUBLE AS val FROM part
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("percentile_battery", percentile_battery, PERCENTILE_SQL)
    register("approx_sketches", approx_sketches, None)
    register("kmv_distinct_portable", kmv_distinct_portable, KMV_DISTINCT_SQL)
    register(
        "sampled_quantile_portable",
        sampled_quantile_portable,
        SAMPLED_QUANTILE_SQL,
    )
    register(
        "kmv_set_algebra_portable",
        kmv_set_algebra_portable,
        KMV_SET_ALGEBRA_SQL,
    )
    register("corr_battery", corr_battery, CORR_BATTERY_SQL)
    register("posexplode_map_battery", posexplode_map_battery, POSEXPLODE_MAP_SQL)
    register("stack_unpivot_part", stack_unpivot_part, STACK_UNPIVOT_SQL)
    register("agg_battery", agg_battery, AGG_BATTERY_SQL)
    register("date_funcs_battery", date_funcs_battery, DATE_FUNCS_SQL)
    register("null_funcs_battery", null_funcs_battery, NULL_FUNCS_SQL)
    register("array_funcs_battery", array_funcs_battery, ARRAY_FUNCS_SQL)
    register("range_join_events", range_join_events, RANGE_JOIN_SQL, headline=True)
