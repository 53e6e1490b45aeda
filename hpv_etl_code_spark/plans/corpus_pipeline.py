"""The composed LLM training-corpus pipeline — the north-star showcase
(BASELINE.json): raw documents → quality gate → language gate → exact
dedup → near-dup removal → clean corpus with features.

Stage order is deliberate for scale: cheap narrow filters (quality,
language) FIRST shrink the corpus before the shuffling stages (exact
dedup, LSH); the expensive near-dup pass runs last on the smallest set.
Every stage is a previously-tested operator — this entry proves they
compose into one lazy plan (a single job at the sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops
from ..operators.dedup import exact_dedup_keepers, lsh_dedup_keepers
from ..sources.registry import load_table


def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → filtered, deduped corpus with quality/token features.

    Rows-only in the driver gate (LSH inside); invariants tested in
    tests/test_corpus_pipeline.py, incl. the pairwise-non-duplicate
    guarantee of the survivor set.
    """
    d = load_table(spark, sf_dir, "documents")

    scored = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        textops.quality_score("text").alias("quality"),
        textops.token_count("text").alias("n_tokens"),
        textops.fingerprint_md5("text").alias("fingerprint"),
    )
    # narrow gates first (no shuffle): quality floor + language allowlist
    gated = scored.filter(
        (F.col("quality") >= 0.2) & F.col("lang").isin("en", "de", "es", "fr")
    )
    # exact dedup: keep the min doc_id per content fingerprint
    keepers = exact_dedup_keepers(gated, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    exact_deduped = gated.join(keepers, "doc_id", "left_semi")
    # near-dup removal last, on the smallest set
    return lsh_dedup_keepers(
        exact_deduped, "doc_id", "text", threshold=0.9, max_bucket=100_000
    ).select("doc_id", "lang", "source", "quality", "n_tokens", "fingerprint")


def register_entries(register) -> None:  # noqa: ANN001
    register("llm_corpus_pipeline", llm_corpus_pipeline, None, headline=True)
