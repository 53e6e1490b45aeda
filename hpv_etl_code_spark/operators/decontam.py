"""Train/eval decontamination, repetition scoring, and TF-IDF terms —
the corpus-hygiene trio every LLM training pipeline runs before a model
sees the data.

Reference scope note: the reference ETL (src/main.py:17-120) has no
text-corpus surface at all — this module is part of the engine's
north-star extension mandate (SURVEY.md §2.11), alongside
operators/dedup.py and operators/textops.py.

Scale design (100 TB corpus, 1000 executors):

- **Decontamination** (benchmark n-gram overlap, the GPT-3/PaLM
  recipe): eval suites are MBs while the corpus is TBs, so the eval
  n-gram set is collected into a broadcast hash side and the corpus
  side streams through explode → broadcast semi join → per-doc count.
  The only shuffle is the per-doc aggregate of MATCHED grams — a few
  rows per contaminated doc, not the exploded corpus.
- **Repetition score** (duplicate n-gram ratio, the Gopher/C4 quality
  gate): pure per-row array expressions — n-gram build, distinct, two
  sizes — no explode, no shuffle, whole-stage codegen end to end.
- **TF-IDF top terms**: one explode feeding two aggregates (per-doc TF,
  corpus DF) joined on token. The DF side is vocabulary-sized
  (≪ corpus); stopword-class tokens skew the token join — AQE skew
  handling applies, and the top-k window runs per doc AFTER the join
  collapses to (doc, term, score) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import textops


def ngram_set(col: Column | str, n: int) -> Column:
    """Distinct word n-grams of a text column."""
    return F.array_distinct(textops.word_ngrams(col, n))


def decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-doc count of distinct n-grams that also appear anywhere
    in the eval set — (id, overlap_ngrams, contaminated) for docs with
    at least one hit.

    The eval n-gram set is deduplicated FIRST (distinct over the small
    side) and broadcast; corpus grams semi-join it so unmatched grams
    die executor-side without shuffling.
    """
    eval_grams = (
        evalset.select(
            F.explode(ngram_set(text_col, n)).alias("gram")
        ).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(ngram_set(text_col, n)).alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
        .withColumn("contaminated", F.col("overlap_ngrams") > 0)
    )


def repetition_score(col: Column | str, n: int = 3) -> Column:
    """Duplicate n-gram ratio in [0, 1): 1 - distinct/total. 0 for docs
    shorter than n tokens (nothing repeats in zero grams)."""
    grams = textops.word_ngrams(col, n)
    total = F.size(grams)
    return F.when(total > 0, F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total, 6
    )).otherwise(F.lit(0.0))


def tfidf_top_terms(
    docs: DataFrame,
    *,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per doc by TF·IDF — (id, term, tf,
    score, term_rank). Deterministic: ties break by term ascending, and
    the IDF is rounded before the product so both engines rank the same
    doubles. ln smoothing: idf = ln((N + 1)/(df + 1))."""
    toks = docs.select(
        F.col(id_col), F.explode(textops.tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    n_docs = docs.select(
        F.countDistinct(id_col).alias("n_docs")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.round(
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                    6,
                ),
                6,
            ),
        )
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "score", "term_rank")
    )
