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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


def register_entries(register) -> None:  # noqa: ANN001
    register("bm25_topk_docs", bm25_topk_docs, _bm25_sql(), headline=True)
    register("mad_outliers_events", mad_outliers_events, MAD_OUTLIERS_SQL)
