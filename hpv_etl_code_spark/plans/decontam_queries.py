"""Catalog entries for corpus hygiene: train/eval decontamination,
repetition scoring, and TF-IDF characteristic terms
(operators/decontam.py) — each with a DuckDB oracle twin.

The eval split is carved deterministically from the documents table
(doc_id % 50 == 0 plays the benchmark suite) so the oracle can rebuild
the exact same split. DuckDB builds n-grams with a list comprehension
over ``string_split``; Spark builds them with ``transform`` over
``sequence`` — same '_'-joined grams, same short-doc guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import decontam, textops
from ..sources.registry import load_table

#: DuckDB word-trigram list for a split-text column ``ts`` (empty when
#: the doc has fewer than 3 tokens — same guard as textops.word_ngrams).
_D_TRIGRAMS = (
    "[ts[i]||'_'||ts[i+1]||'_'||ts[i+2] "
    "for i in range(1, greatest(len(ts)-1, 1))]"
)


def decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus docs sharing ≥1 distinct trigram with the eval split.

    Eval n-grams broadcast (eval suites are MB-scale next to a TB
    corpus); corpus grams die at the semi join executor-side, so the
    only shuffle carries matched (doc_id, gram) rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return decontam.decontaminate(corpus, evalset, n=3).orderBy("doc_id")


DECONTAMINATION_SQL = f"""
WITH grams AS (
  SELECT doc_id,
         unnest(list_distinct({_D_TRIGRAMS})) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0)
SELECT doc_id, COUNT(*) AS overlap_ngrams, COUNT(*) > 0 AS contaminated
FROM grams
WHERE doc_id % 50 <> 0 AND gram IN (SELECT gram FROM eval_grams)
GROUP BY doc_id
ORDER BY doc_id
"""


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style duplicate-trigram ratio per doc — pure per-row
    array expressions, zero shuffles (the ORDER BY is presentational)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = textops.word_ngrams("text", 3)
    return docs.select(
        "doc_id",
        F.size(grams).alias("n_grams"),
        decontam.repetition_score("text", 3).alias("rep_ratio"),
    ).orderBy("doc_id")


REPETITION_SQL = f"""
SELECT doc_id,
  len({_D_TRIGRAMS})::INT AS n_grams,
  CASE WHEN len(ts) >= 3 THEN
    ROUND(1.0 - len(list_distinct({_D_TRIGRAMS})) * 1.0
              / len({_D_TRIGRAMS}), 6)
  ELSE 0.0 END AS rep_ratio
FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
ORDER BY doc_id
"""


def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF·IDF terms per doc — explode feeding TF and DF
    aggregates, vocabulary-sized DF side joined back on token."""
    docs = load_table(spark, sf_dir, "documents")
    return decontam.tfidf_top_terms(docs, k=3).orderBy("doc_id", "term_rank")


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, term, tf, score, term_rank
FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * ROUND(LN((n.n_docs + 1.0) / (df.df + 1.0)), 6), 6)
           AS score,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(tf.tf * ROUND(LN((n.n_docs + 1.0) / (df.df + 1.0)), 6), 6) DESC,
                    tf.term ASC
         )::INT AS term_rank
  FROM tf JOIN df USING (term) CROSS JOIN n
) ranked
WHERE term_rank <= 3
ORDER BY doc_id, term_rank
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("decontamination_check", decontamination_check, DECONTAMINATION_SQL)
    register("repetition_scores", repetition_scores, REPETITION_SQL)
    register("tfidf_terms", tfidf_terms, TFIDF_SQL)
