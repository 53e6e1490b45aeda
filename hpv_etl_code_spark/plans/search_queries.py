"""Retrieval and robust-statistics entries: BM25 keyword search and
median/MAD outlier flagging.

BM25 is the classic lexical-retrieval scorer (Robertson et al., the
default ranking function in Lucene/Elasticsearch). For a FIXED query
term set the whole computation is expressible without exploding the
corpus: per-term term-frequencies are array scans inside codegen
(``size(filter(toks, t))``), corpus statistics (N, avg doc length,
per-term document frequencies) are one partial-aggregate pass broadcast
back, and top-k is ``orderBy().limit()`` — which Spark plans as
TakeOrderedAndProject (per-partition heaps + merge), never a global
sort. At 100 TB nothing here shuffles the corpus at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine
from ..operators.textops import tokens
from ..sources.registry import load_table

BM25_TERMS = ("vector", "stream", "filter")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def _tf(term: str) -> Column:
    return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by BM25 for a fixed conjunctive keyword query.

    Plan shape: one narrow projection computes (dl, tf_t...) per doc
    with NO explode; a 1-row aggregate (N, avgdl, df_t...) broadcasts
    back; the score is pure arithmetic; TakeOrderedAndProject keeps
    top-k scalable. Ranking ties break on doc_id, and the sort key is
    the ROUNDED score so both engines rank identically."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    per_doc = docs.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(BM25_TERMS)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(BM25_TERMS)):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        norm = tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        score = score + idf * tf * (BM25_K1 + 1) / norm
    return (
        scored.withColumn("bm25", F.round(score, 6))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .select("doc_id", "bm25")
    )


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(t, x -> x = '{term}')) AS tf_{i}"
        for i, term in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    score_terms = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * ({BM25_K1} + 1)"
        f" / (tf_{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH per_doc AS (
  SELECT doc_id, len(t) AS dl, {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM per_doc
)
SELECT doc_id, round({score_terms}, 6) AS bm25
FROM per_doc, stats
WHERE round({score_terms}, 6) > 0
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP_K}
"""


MAD_K = 3.0
MAD_CONSISTENCY = 1.4826  # normal-consistency constant for MAD→σ


def mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outliers: |value − median| > 3·1.4826·MAD.

    Median/MAD resist the contamination that wrecks mean/stddev gating
    (one huge outlier inflates σ until nothing is an outlier). Two
    grouped medians (group cardinality is small — per-group stats are
    metadata-class) broadcast back onto the fact; the fact itself never
    shuffles."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = (
        with_med.groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .withColumn(
            "robust_z",
            F.round(
                F.abs(F.col("value") - F.col("med"))
                / (F.lit(MAD_CONSISTENCY) * F.col("mad")),
                6,
            ),
        )
        .filter(F.col("robust_z") > MAD_K)
        .select("event_id", "event_type", "value", "robust_z")
    )


MAD_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round(abs(e.value - m.med) / ({MAD_CONSISTENCY} * d.mad), 6) AS robust_z
FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
WHERE round(abs(e.value - m.med) / ({MAD_CONSISTENCY} * d.mad), 6) > {MAD_K}
"""


RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
HYBRID_POOL = 20  # per-branch candidate pool
HYBRID_TOP_K = 10
HYBRID_QUERY_VEC = 0  # vec_id used as the dense query


def hybrid_rrf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse a lexical (BM25) ranking over ``documents``
    with a dense (cosine) ranking over ``embeddings`` by Reciprocal Rank
    Fusion — ``score(d) = Σ_branch 1/(RRF_K + rank_branch(d))``, the
    standard fusion rule modern RAG stacks run over a keyword index plus
    a vector index.

    Scale shape: each branch is independently scalable (BM25 computes
    with no corpus explode + TakeOrderedAndProject; the dense branch
    broadcasts ONE query vector and TakeOrderedAndProject's the scored
    corpus — the corpus never shuffles). Fusion then operates on two
    k-row candidate pools — metadata-sized, so the rank windows and the
    full-outer merge are free. A doc missing from one branch simply
    contributes nothing for it (the COALESCE(0) in the score).

    Determinism: both branch ranks order by (rounded score DESC, id),
    and the fused score is arithmetic on integer ranks — exactly
    reproducible by the oracle."""
    lex_pool = bm25_topk_docs(spark, sf_dir).limit(HYBRID_POOL)
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("lex_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("embedding").alias("qv")
    )
    dense_pool = (
        emb.filter(F.col("vec_id") != HYBRID_QUERY_VEC)
        .join(F.broadcast(qv))  # 1-row broadcast: the query vector
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(HYBRID_POOL)
    )
    dense = dense_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), "doc_id"))
        .alias("vec_rank"),
    )

    # fuse by UNION + groupBy rather than a full-outer join: Spark can't
    # broadcast full-outer (it would sort-merge even two 20-row pools),
    # while the union aggregates in one metadata-sized exchange; the
    # per-doc RRF sum has ≤2 addends, so IEEE addition order is moot
    both = lex.select(
        "doc_id", F.lit("lex").alias("branch"), F.col("lex_rank").alias("rk")
    ).unionByName(
        dense.select(
            "doc_id", F.lit("vec").alias("branch"), F.col("vec_rank").alias("rk")
        )
    )
    fused = both.groupBy("doc_id").agg(
        F.max(F.when(F.col("branch") == "lex", F.col("rk"))).alias("lex_rank"),
        F.max(F.when(F.col("branch") == "vec", F.col("rk"))).alias("vec_rank"),
        F.round(F.sum(F.lit(1.0) / (F.lit(RRF_K) + F.col("rk"))), 6).alias(
            "rrf_score"
        ),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(HYBRID_TOP_K)


def _hybrid_rrf_sql() -> str:
    return f"""
WITH lex_pool AS (
  SELECT * FROM ({_bm25_sql()}) LIMIT {HYBRID_POOL}
), lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM lex_pool
), dense_pool AS (
  SELECT e.vec_id AS doc_id,
         round(list_dot_product(e.embedding, q.embedding) /
               (sqrt(list_dot_product(e.embedding, e.embedding)) *
                sqrt(list_dot_product(q.embedding, q.embedding))), 6) AS cos
  FROM embeddings e, (SELECT embedding FROM embeddings
                      WHERE vec_id = {HYBRID_QUERY_VEC}) q
  WHERE e.vec_id <> {HYBRID_QUERY_VEC}
  ORDER BY cos DESC, doc_id LIMIT {HYBRID_POOL}
), dense AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
  FROM dense_pool
), both_b AS (
  SELECT doc_id, 'lex' AS branch, lex_rank AS rk FROM lex
  UNION ALL
  SELECT doc_id, 'vec' AS branch, vec_rank AS rk FROM dense
)
SELECT doc_id,
       MAX(CASE WHEN branch = 'lex' THEN rk END) AS lex_rank,
       MAX(CASE WHEN branch = 'vec' THEN rk END) AS vec_rank,
       round(SUM(1.0::DOUBLE / ({RRF_K} + rk)), 6) AS rrf_score
FROM both_b GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id LIMIT {HYBRID_TOP_K}
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("bm25_topk_docs", bm25_topk_docs, _bm25_sql(), headline=True)
    register("mad_outliers_events", mad_outliers_events, MAD_OUTLIERS_SQL)
    register("hybrid_rrf_docs", hybrid_rrf_docs, _hybrid_rrf_sql())
