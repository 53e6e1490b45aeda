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
from ..operators.dedup import (
    exact_dedup_keepers,
    minhash_lsh_pairs_portable,
)
from ..sources.registry import load_table


def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → filtered, deduped corpus with quality/token features.

    Rows-only in the driver gate (LSH inside); invariants tested in
    tests/test_corpus_pipeline.py, incl. the pairwise-non-duplicate
    guarantee of the survivor set.

    Runs from the session-cached frames (plans/shared_cache.py), shared
    with ``dedup_minhash_lsh`` / ``dedup_incremental_fast``: the NARROW
    per-document frame (scalars + gkey — no signature payload, round 9)
    feeds the gates/exact-dedup/survivor stages, and the per-distinct-
    tokset group frame carries the MinHash signatures only into the
    banding stage — so per-entry cost is the join topology, not a
    corpus re-tokenization, and no stage moves signature bytes it
    doesn't band with.
    """
    from ..operators.dedup import minhash_lsh_pairs_grouped
    from .shared_cache import (
        corpus_lsh_params,
        pipeline_exact_deduped,
        pipeline_grouped,
    )

    # narrow gates + exact dedup come persisted from the shared cache
    # (quality floor, language allowlist, min-id-per-fingerprint keeper)
    exact_deduped = pipeline_exact_deduped(spark, sf_dir)
    # near-dup removal last, on the smallest set, over the identical-
    # tokset-collapsed base (greedy lowest-id-wins, as lsh_dedup_keepers)
    members, groups = pipeline_grouped(spark, sf_dir)
    # Round 8 (VERDICT r7 #1): banding auto-sizes with the corpus. The
    # 0.9-threshold regime is always narrower than the 0.8-sized
    # persisted signature (for fixed r, bands≈t^-r shrinks as t grows),
    # so the prefix property lets it band off the shared sig column.
    nh, bands = corpus_lsh_params(spark, sf_dir, threshold=0.9)
    pairs = minhash_lsh_pairs_grouped(
        members,
        groups,
        threshold=0.9,
        num_hashes=nh,
        bands=bands,
        max_bucket=100_000,
    )
    doomed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return exact_deduped.join(doomed, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "quality", "n_tokens", "fingerprint"
    )


def _corpus_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared quality→language→exact-dedup prefix of both variants."""
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
    gated = scored.filter(
        (F.col("quality") >= 0.2) & F.col("lang").isin("en", "de", "es", "fr")
    )
    keepers = exact_dedup_keepers(gated, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    return gated.join(keepers, "doc_id", "left_semi")


def llm_corpus_pipeline_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME composed pipeline, ORACLE-CHECKED end-to-end: the
    near-dup stage uses the portable md5 MinHash (operators/dedup.py::
    minhash_lsh_pairs_portable), so DuckDB reproduces every stage —
    quality gate, language gate, exact dedup, LSH candidates, greedy
    lowest-id-wins survivor set — bit-for-bit.

    Round 5: the LSH stage rides the portable identical-tokset collapse
    (plans/shared_cache.py::pipeline_portable_grouped +
    operators/dedup.py::minhash_lsh_pairs_portable_grouped) — one md5
    signature chain per distinct surviving tokset; pair output is
    test-locked identical to the flat miner, so the end-to-end oracle
    is unchanged."""
    from ..operators.dedup import minhash_lsh_pairs_portable_grouped
    from .shared_cache import pipeline_exact_deduped, pipeline_portable_grouped

    ed = pipeline_exact_deduped(spark, sf_dir)
    members, pgroups = pipeline_portable_grouped(spark, sf_dir)
    pairs = minhash_lsh_pairs_portable_grouped(members, pgroups, threshold=0.9)
    doomed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return ed.join(doomed, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "quality", "n_tokens", "fingerprint"
    )


def _corpus_oracle_sql() -> str:
    from .text_queries import _STOP_SQL

    quality = f"""ROUND(0.5 * (len(list_intersect(dtoks, {_STOP_SQL['en']})) * 1.0
               / greatest(len(dtoks), 1))
      + 0.3 * least(len(tk) / 50.0, 1.0)
      + 0.2 * (len(dtoks) * 1.0 / greatest(len(tk), 1)), 6)"""
    return f"""
WITH base AS (
  SELECT doc_id, text, lang, source,
    string_split(text, ' ') AS tk,
    list_distinct(string_split(text, ' ')) AS dtoks
  FROM documents
), scored AS (
  SELECT doc_id, text, lang, source, dtoks,
    {quality} AS quality,
    len(tk)::INT AS n_tokens,
    md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS fingerprint
  FROM base
), gated AS (
  SELECT * FROM scored
  WHERE quality >= 0.2 AND lang IN ('en', 'de', 'es', 'fr')
), ed AS (
  SELECT * FROM gated
  WHERE doc_id IN (SELECT MIN(doc_id) FROM gated GROUP BY fingerprint)
), e AS (
  SELECT doc_id, unnest(dtoks) AS tok FROM ed
), h AS (
  SELECT doc_id, s.seed,
    MIN(('0x' || substr(md5(s.seed::VARCHAR || '|' || tok), 1, 15))::BIGINT) AS mh
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
  GROUP BY doc_id, s.seed
), bands AS (
  SELECT doc_id, seed // 4 AS band,
    md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bkey
  FROM h GROUP BY doc_id, seed // 4
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
), doomed AS (
  SELECT DISTINCT id_b FROM cand
  JOIN ed ta ON ta.doc_id = cand.id_a
  JOIN ed tb ON tb.doc_id = cand.id_b
  WHERE ROUND(len(list_intersect(ta.dtoks, tb.dtoks)) * 1.0 /
        greatest(len(ta.dtoks) + len(tb.dtoks)
                 - len(list_intersect(ta.dtoks, tb.dtoks)), 1), 6) >= 0.9
)
SELECT doc_id, lang, source, quality, n_tokens, fingerprint
FROM ed WHERE doc_id NOT IN (SELECT id_b FROM doomed)
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("llm_corpus_pipeline", llm_corpus_pipeline, None, headline=True)
    register(
        "llm_corpus_pipeline_portable",
        llm_corpus_pipeline_portable,
        _corpus_oracle_sql(),
    )
