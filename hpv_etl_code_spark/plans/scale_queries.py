"""Scale-pattern catalog entries: global row numbering without a global
sort, Z-order clustering keys, blocked fuzzy matching, SCD2 interval
building, and cross-document repeated-span detection.

Each entry demonstrates a pattern that matters specifically at 100 TB
(the naive formulation works on a laptop and dies on a cluster) and is
oracle-checked against DuckDB at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.layout import global_row_index, morton_z16, morton_z16_sql
from ..operators.textops import tokens
from ..sources.registry import load_table


# ------------------------------------------------- global row numbering

def global_index_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global index over orders by key — two-phase bucketed
    numbering (operators/layout.py), NOT a single-partition window. The
    oracle is the naive formulation; at sf0.01 both agree, at 100 TB
    only the bucketed plan survives."""
    o = load_table(spark, sf_dir, "orders")
    return global_row_index(
        o.select("o_orderkey", "o_totalprice"), key="o_orderkey"
    ).select("o_orderkey", "o_totalprice", "global_idx")


GLOBAL_INDEX_SQL = """
SELECT o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_orderkey) AS global_idx
FROM orders
"""


# ----------------------------------------------------- Z-order clustering

def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton Z-value over (customer, quantized price) — the clustering
    key behind two-dimensional file skipping. The full layout operator
    (range-partition + sort by this key, ``operators/layout.py:
    zorder_layout``) is plan-asserted in tests; the catalog entry checks
    the bit-interleave arithmetic against an unrolled SQL twin."""
    o = load_table(spark, sf_dir, "orders")
    price_q = F.floor(F.col("o_totalprice") / 32)
    return o.select(
        "o_orderkey",
        morton_z16(F.col("o_custkey"), price_q).alias("zval"),
    )


ZORDER_KEY_SQL = f"""
SELECT o_orderkey,
       {morton_z16_sql("o_custkey", "CAST(floor(o_totalprice / 32) AS BIGINT)")} AS zval
FROM orders
"""


# ------------------------------------------------- blocked fuzzy matching

def fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: near-identical part names (edit distance ≤ 2)
    found via BLOCKING — pairs are only generated inside a brand block,
    so the comparison count is Σ|block|²/2, not |table|²/2. The length
    prefilter (|len(a)−len(b)| ≤ 2) is lossless (edit distance is
    bounded below by the length difference) and prunes before the
    expensive levenshtein — the standard blocked-ER shape; at 100 TB the
    block key would come from cheap normalization (soundex, prefix,
    sorted tokens) tuned so blocks stay bounded."""
    from ..operators.editjoin import fuzzy_pairs_collapsed

    # round 5: candidate generation switched from the quadratic block
    # self-join (Σ|block|²/2 — 800M banded-levenshtein calls at sf1) to
    # the identical-name collapse (operators/editjoin.py): name pairs
    # mined over one representative per distinct (brand, name) — a
    # dimension-table-sized frame for attribute-style columns — then
    # expanded through the members map. Output identical (test-locked
    # vs the brute join) so the oracle below is unchanged; the
    # deletion-neighborhood variant (fuzzy_edit_pairs) remains the
    # high-name-cardinality alternative.
    p = load_table(spark, sf_dir, "part")
    return fuzzy_pairs_collapsed(p, "p_partkey", "p_name", "p_brand").select(
        F.col("block").alias("brand"), "key_a", "key_b", "edit_dist"
    )


FUZZY_BLOCKED_SQL = """
SELECT a.p_brand AS brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a
JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
"""


# ------------------------------------------------------- SCD2 intervals

def scd2_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each event opens a
    validity interval that the user's NEXT event closes (half-open
    [valid_from, valid_to)); the latest row per user is current. One
    shuffle on the dimension key — the standard changelog→SCD2
    transform of a warehouse load."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_SQL = """
SELECT user_id, event_id, event_type, value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# -------------------------------------------- repeated-span detection

def shingle_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: pairs of documents sharing at
    least one verbatim 8-token window, with the count of shared distinct
    shingles — the detection primitive behind substring-level training
    -data dedup (exact repeated passages, not whole-doc similarity).

    Scale shape: shingles hash to fixed-width md5 keys; the only wide
    shuffle is the (doc_id, shingle) inverted index, and pair generation
    happens per shingle bucket (boilerplate-heavy shingles would get the
    same hot-bucket cap as MinHash LSH, ``operators/dedup.py``)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    shingles = F.when(
        n >= 8,
        F.array_distinct(
            F.transform(
                # sequence(a, b) DESCENDS when b < a — the n>=8 guard
                # above is what keeps this from exploding on short docs
                F.sequence(F.lit(1), n - 7),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 8))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    index = docs.select(
        F.col("doc_id"), F.explode(shingles).alias("sh")
    )
    a = index.select(F.col("doc_id").alias("id_a"), "sh")
    b = index.select(F.col("doc_id").alias("id_b"), "sh")
    return (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


SHINGLE_SPAN_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS sh
  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# --------------------------------------------- equi-depth histogram

N_DEPTH_BUCKETS = 10


def equidepth_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile (equi-depth) price histogram WITHOUT a global ntile — a
    global ``ntile(10) OVER (ORDER BY ...)`` funnels the table through
    one window partition; here the bucketed global index supplies the
    rank and the decile is row-local arithmetic on it. Ties on price
    break by order key (same ordering in the oracle), so both engines
    assign identical deciles. The residual scale hazard is a single
    price value dominating the distribution — its ties still share a
    range bucket; raise n_buckets or pre-dither in that regime."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    idx = global_row_index(
        o, key="o_totalprice", tiebreak=("o_orderkey",), n_buckets=32
    )
    n = o.count()  # scalar metadata; deliberately a separate cheap job
    # explicit floor: Spark's double->long cast truncates but DuckDB's
    # rounds — floor() is the one semantics both engines share
    decile = (
        F.floor((F.col("global_idx") - 1) * N_DEPTH_BUCKETS / F.lit(n)) + 1
    )
    return (
        idx.groupBy(decile.alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


EQUIDEPTH_SQL = f"""
WITH r AS (
  SELECT o_totalprice,
    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER () AS n
  FROM orders
)
SELECT floor((rn - 1) * {N_DEPTH_BUCKETS} * 1.0 / n)::BIGINT + 1 AS decile,
  COUNT(*) AS n_rows,
  round(MIN(o_totalprice), 2) AS lo,
  round(MAX(o_totalprice), 2) AS hi
FROM r GROUP BY 1
"""


def fuzzy_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deletion-neighborhood generator (SymSpell pigeonhole
    candidates + exact banded refine) over the same parts surface as
    ``fuzzy_blocked_pairs`` — output-identical by construction, so it
    shares that entry's oracle; registering it separately keeps the
    generator under driver-level hash verification, not just pytest.

    r6 sweep fix: the generator now runs COLLAPSED (reps per distinct
    (brand, name), neighborhoods over the ~64 reps, members expanded
    back) — the flat form exploded every member's ~L²/2 deletion
    variants into the equi-join where heavy name repetition made
    collisions quadratic in members (264 s → ~2 s at sf1, identical
    rows). The flat :func:`~...editjoin.fuzzy_edit_pairs` remains the
    right generator when names are high-cardinality."""
    from ..operators.editjoin import fuzzy_pairs_collapsed

    p = load_table(spark, sf_dir, "part")
    return fuzzy_pairs_collapsed(
        p, "p_partkey", "p_name", "p_brand", generator="neighborhood"
    ).select(F.col("block").alias("brand"), "key_a", "key_b", "edit_dist")


def register_entries(register) -> None:  # noqa: ANN001
    register("global_index_orders", global_index_orders, GLOBAL_INDEX_SQL, headline=True)
    register("zorder_key_orders", zorder_key_orders, ZORDER_KEY_SQL)
    register("fuzzy_blocked_pairs", fuzzy_blocked_pairs, FUZZY_BLOCKED_SQL)
    register("fuzzy_neighborhood_pairs", fuzzy_neighborhood_pairs, FUZZY_BLOCKED_SQL)
    register("scd2_user_events", scd2_user_events, SCD2_SQL)
    register("shingle_span_pairs", shingle_span_pairs, SHINGLE_SPAN_SQL)
    register(
        "equidepth_histogram_prices", equidepth_histogram_prices, EQUIDEPTH_SQL
    )
