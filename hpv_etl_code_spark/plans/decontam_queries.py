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


def decontam_passage_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SURGICAL decontamination option: instead of dropping every
    corpus doc that shares an n-gram with the eval suite
    (``decontamination_check``), remove only the CONTAMINATED PASSAGES
    — corpus k-token windows whose hash appears anywhere in the eval
    split, island-merged into maximal spans and stripped
    (operators/spandedup.py). This is what a pipeline does when eval
    passages are quoted inside otherwise-good documents.

    Scale: the eval side is MB-scale next to a TB corpus, so its
    distinct window hashes BROADCAST; corpus windows die executor-side
    in the map-side join, and everything after the match is
    contamination-scale. Output is total — one row per corpus doc,
    untouched docs report tok_after = tok_before."""
    from ..operators import spandedup

    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    ew = spandedup.window_hashes(evalset, "text", "doc_id", spandedup.K_TOKENS)
    cw = spandedup.window_hashes(corpus, "text", "doc_id", spandedup.K_TOKENS)
    hit = cw.join(F.broadcast(ew.select("h").distinct()), "h").select(
        "doc_id", "pos"
    )
    spans = spandedup.merge_spans(hit, "doc_id", spandedup.K_TOKENS)
    return spandedup.strip_spans(corpus, spans, "text", "doc_id").orderBy(
        "doc_id"
    )


def _scrub_sql() -> str:
    from ..operators.spandedup import K_TOKENS as K

    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE doc_id % 50 <> 0
),
te AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE doc_id % 50 = 0
),
ew AS (
  SELECT DISTINCT unnest([md5(array_to_string(ts[i:i+{K - 1}], ' '))
                          for i in range(1, greatest(len(ts) - {K - 2}, 1))]) AS h
  FROM te
),
w0 AS (
  SELECT doc_id,
         unnest([{{'pos': i,
                   'h': md5(array_to_string(ts[i:i+{K - 1}], ' '))}}
                 for i in range(1, greatest(len(ts) - {K - 2}, 1))]) AS u
  FROM t
),
d AS (
  SELECT doc_id, (u).pos AS pos FROM w0
  WHERE (u).h IN (SELECT h FROM ew)
),
g AS (
  SELECT doc_id, pos,
         MAX(pos + {K - 1}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM d
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM g
),
s AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {K - 1} AS span_end
  FROM isl GROUP BY doc_id, island
),
tokpos AS (
  SELECT doc_id,
         unnest([{{'tok': ts[i], 'p': i}}
                 for i in range(1, len(ts) + 1)]) AS u
  FROM t
),
kept AS (
  SELECT tp.doc_id, (tp.u).tok AS tok, (tp.u).p AS p
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM s
    WHERE s.doc_id = tp.doc_id
      AND (tp.u).p BETWEEN s.span_start AND s.span_end)
),
clean AS (
  SELECT doc_id, COUNT(*) AS tok_after,
         md5(string_agg(tok, ' ' ORDER BY p)) AS clean_sig
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.ts) AS tok_before,
       COALESCE(clean.tok_after, 0)::BIGINT AS tok_after,
       COALESCE(clean.clean_sig, md5('')) AS clean_sig
FROM t LEFT JOIN clean USING (doc_id)
ORDER BY t.doc_id
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("decontamination_check", decontamination_check, DECONTAMINATION_SQL)
    register("repetition_scores", repetition_scores, REPETITION_SQL)
    register("tfidf_terms", tfidf_terms, TFIDF_SQL)
    register("decontam_passage_scrub", decontam_passage_scrub, _scrub_sql())
