"""Session-scoped shared computation for the corpus-processing entries.

The three heaviest headline entries — full-corpus LSH pair mining, the
composed LLM corpus pipeline, and incremental batch-vs-corpus dedup —
all start from the same per-document derived columns over ``documents``:
quality score, token count, content fingerprints, xxhash64-hashed token
set, MinHash signature. Computing that prefix once and persisting it is
exactly what a steady-state 100 TB pipeline does (it writes the enriched
frame / dedup index as a parquet artifact and every downstream job reads
it instead of re-tokenizing the corpus — see
``operators/dedup.py::build_corpus_index``).

This module is the in-process analog: one materialized DataFrame per
(SparkSession, sf_dir), built lazily on first use. Results are
unchanged — every derived column is a deterministic per-row function —
only the redundant recompute across entries disappears.

Materialization goes through the :mod:`.artifacts` storage seam
(VERDICT r5 #7): the default is a session-scoped memory persist;
setting ``SPARK_GRAFT_STAGE_STORAGE=parquet`` turns every shared frame
into a durable parquet artifact (lineage truncated — a cluster run
survives executor loss without recompute storms), equivalence-tested
in ``tests/test_artifacts.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops
from .artifacts import stage_artifact
from ..operators.dedup import minhash_signature, scaled_lsh_params
from ..operators.textops import distinct_tokens
from ..sources.registry import load_table

# Width of the PORTABLE md5 signature the (16, 4)-pinned oracle entries
# certify against (dedup_minhash_portable, llm_corpus_pipeline_portable
# and their DuckDB twins unroll exactly 16 hashes / 4 bands). The
# DEFAULT xxhash64 paths auto-size instead — see :func:`corpus_lsh_params`
# (VERDICT r7 #1: fixed (16, 4) banding is FP-quadratic at scale).
_NUM_HASHES = 16

_CACHE: dict[tuple[str, str], DataFrame] = {}
_COUNTS: dict[tuple[str, str], int] = {}


def corpus_count(
    spark: SparkSession, sf_dir: str, table: str = "documents"
) -> int:
    """Row count of a corpus table, one count job per (session, sf_dir,
    table) — the input to banding/hyperplane auto-sizing. At 100 TB
    this is parquet footer metadata, not a scan."""
    key = (spark.sparkContext.applicationId, sf_dir, table)
    if key not in _COUNTS:
        _COUNTS[key] = load_table(spark, sf_dir, table).count()
    return _COUNTS[key]


def corpus_lsh_params(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8
) -> tuple[int, int]:
    """(num_hashes, bands) for the DEFAULT dedup paths, auto-sized from
    the corpus count via ``operators/dedup.py::scaled_lsh_params``
    (decade-rounded, so the regime is a step function of corpus
    magnitude). At the bench scales: sf0.01 → (15, 3), sf0.1 → (35, 5),
    sf1 → (63, 7), sf10 → (90, 9) — candidate growth stays ≈ linear
    where the pinned (16, 4) was measured FP-quadratic (SCALING.md)."""
    return scaled_lsh_params(corpus_count(spark, sf_dir), threshold)


def enriched_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` + the shared derived columns, persisted once per
    session and scale factor:

    - ``quality`` / ``n_tokens`` — textops scores (plain expressions)
    - ``fingerprint`` — normalized md5 (exact-dedup key)
    - ``fp`` — raw md5(text) (``build_corpus_index`` fingerprint)
    - ``toks`` — xxhash64-hashed distinct token set (long array)
    - ``sig`` — MinHash signature over ``toks``, AUTO-SIZED to the
      corpus magnitude (:func:`corpus_lsh_params` at the default 0.8
      threshold). The seeded family has the prefix property (seeds
      0..k-1), so any banding with num_hashes ≤ this width reads the
      correct k-hash signature off the same persisted column — the
      corpus pipeline's 0.9-threshold banding (narrower) shares it
    - ``gkey`` — identical-tokset group key (``xxhash64(array_sort(toks))``,
      the :func:`~..operators.dedup.tokset_groups` collapse key)

    The persist is MEMORY_AND_DISK (default): at bench scale it is a few
    hundred MB; a cluster deployment would write it to parquet instead
    (same columns round-trip — they are all plain types).
    """
    key = (spark.sparkContext.applicationId, sf_dir, "enriched")
    if key not in _CACHE:
        _prune_dead_entries()
        d = load_table(spark, sf_dir, "documents")
        base = (
            d.select(
                "doc_id",
                "text",
                "lang",
                "source",
                textops.quality_score("text").alias("quality"),
                textops.token_count("text").alias("n_tokens"),
                textops.fingerprint_md5("text").alias("fingerprint"),
                F.md5(F.col("text")).alias("fp"),
                F.array_distinct(
                    F.transform(distinct_tokens("text"), lambda t: F.xxhash64(t))
                ).alias("toks"),
            )
            .withColumn(
                "sig",
                minhash_signature(
                    F.col("toks"), corpus_lsh_params(spark, sf_dir)[0]
                ),
            )
            .withColumn("gkey", F.xxhash64(F.array_sort("toks")))
        )
        _CACHE[key] = stage_artifact(base, "shared_enriched")
    return _CACHE[key]


def grouped_corpus(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The identical-tokset collapse of the full signed corpus
    (``operators.dedup.tokset_groups``), both halves persisted:
    ``members`` (doc_id → gkey, tiny) and ``groups`` (one row per
    distinct tokset with its shared toks/sig and member count). The LSH
    plan references ``groups`` from many branches — persisting it is
    what keeps the collapse a win (an unpersisted grouped aggregate is
    recomputed per branch). At 100 TB both are parquet artifacts written
    next to the signed base."""
    from ..operators.dedup import tokset_groups

    key = (spark.sparkContext.applicationId, sf_dir, "groups")
    if key not in _CACHE:
        e = enriched_documents(spark, sf_dir)
        members, groups = tokset_groups(
            e.select(F.col("doc_id").alias("id"), "toks", "sig", "gkey")
        )
        _CACHE[key] = (
            stage_artifact(members, "shared_members"),
            stage_artifact(groups, "shared_groups"),
        )
    return _CACHE[key]


def _portable_groups_of(e: DataFrame, num_hashes: int) -> DataFrame:
    """One row per distinct tokset with the STRING token set and an
    md5 min-hash signature of the given width — the single builder
    behind every portable group frame (round-8 review: three verbatim
    copies diverge silently on the next fix)."""
    from ..operators.dedup import _portable_minhash_sig

    return (
        e.groupBy("gkey")
        .agg(
            F.count(F.lit(1)).alias("gn"),
            F.first(distinct_tokens("text")).alias("toks"),
        )
        .withColumn("sig", _portable_minhash_sig("toks", num_hashes))
    )


def portable_grouped_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The identical-tokset collapse for the PORTABLE (md5) hash family
    (round 5): ``members`` is shared with :func:`grouped_corpus` (the
    gkey is tokenizer-level, so the same key serves both families);
    ``pgroups`` carries one row per distinct tokset with the STRING
    token set and the md5 min-hash signature — the expensive portable
    chain (num_hashes md5 calls per token) computed once per distinct
    tokset instead of once per document. Persisted: the LSH plan reads
    it from several branches."""
    key = (spark.sparkContext.applicationId, sf_dir, "pgroups")
    if key not in _CACHE:
        e = enriched_documents(spark, sf_dir)
        members, _ = grouped_corpus(spark, sf_dir)
        pgroups = _portable_groups_of(e, _NUM_HASHES)
        _CACHE[key] = (members, stage_artifact(pgroups, "shared_pgroups"))
    return _CACHE[key]


def pipeline_exact_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus pipeline's gated + exact-deduped frame (quality floor,
    language allowlist, min-id-per-fingerprint keeper), persisted — the
    LSH stage and the final survivor projection both read it."""
    key = (spark.sparkContext.applicationId, sf_dir, "pipeline_exact")
    if key not in _CACHE:
        e = enriched_documents(spark, sf_dir)
        gated = e.filter(
            (F.col("quality") >= 0.2) & F.col("lang").isin("en", "de", "es", "fr")
        )
        keepers = gated.groupBy("fingerprint").agg(
            F.min("doc_id").alias("doc_id")
        )
        _CACHE[key] = stage_artifact(
            gated.join(keepers.select("doc_id"), "doc_id", "left_semi"),
            "shared_pipeline_exact",
        )
    return _CACHE[key]


def pipeline_grouped(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Identical-tokset collapse of :func:`pipeline_exact_deduped`
    (the corpus pipeline's LSH input), persisted like
    :func:`grouped_corpus`."""
    from ..operators.dedup import tokset_groups

    key = (spark.sparkContext.applicationId, sf_dir, "pipeline_groups")
    if key not in _CACHE:
        base = pipeline_exact_deduped(spark, sf_dir).select(
            F.col("doc_id").alias("id"), "toks", "sig", "gkey"
        )
        members, groups = tokset_groups(base)
        _CACHE[key] = (
            stage_artifact(members, "shared_pipeline_members"),
            stage_artifact(groups, "shared_pipeline_groups"),
        )
    return _CACHE[key]


def pipeline_portable_grouped(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Portable-family collapse of the PIPELINE's gated+exact-deduped
    frame (round 5): the LSH stage of llm_corpus_pipeline_portable runs
    over one md5 signature per distinct surviving tokset. Same
    structure as :func:`portable_grouped_corpus`, subset to the
    pipeline's ed frame."""
    key = (spark.sparkContext.applicationId, sf_dir, "pipeline_pgroups")
    if key not in _CACHE:
        ed = pipeline_exact_deduped(spark, sf_dir)
        members = ed.select(F.col("doc_id").alias("id"), "gkey")
        pgroups = _portable_groups_of(ed, _NUM_HASHES)
        _CACHE[key] = (members, stage_artifact(pgroups, "shared_pipeline_pgroups"))
    return _CACHE[key]


def incremental_grouped(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Frames for the grouped incremental-dedup entry
    (``operators.dedup.incremental_survivors_grouped``): ``(new_docs,
    batch_groups, corpus_fps, corpus_groups)`` over the doc_id%5
    batch/corpus split. Both group frames are persisted (each is
    referenced by several plan branches); new_docs/corpus_fps read the
    persisted enriched frame directly."""
    from ..operators.dedup import tokset_groups

    key = (spark.sparkContext.applicationId, sf_dir, "incr_groups")
    if key not in _CACHE:
        e = enriched_documents(spark, sf_dir)
        newe = e.filter(F.col("doc_id") % 5 == 0)
        corpus = e.filter(F.col("doc_id") % 5 != 0)
        sel = lambda df: df.select(  # noqa: E731
            F.col("doc_id").alias("id"), "toks", "sig", "gkey"
        )
        _, batch_groups = tokset_groups(sel(newe))
        _, corpus_groups = tokset_groups(sel(corpus))
        new_docs = newe.select(F.col("doc_id").alias("id"), "text", "fp", "gkey")
        corpus_fps = corpus.select("fp")
        _CACHE[key] = (
            new_docs,
            stage_artifact(batch_groups, "shared_incr_batch_groups"),
            corpus_fps,
            stage_artifact(corpus_groups, "shared_incr_corpus_groups"),
        )
    return _CACHE[key]


def scaled_portable_grouped_corpus(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Portable-family collapse with the AUTO-SIZED signature width
    (VERDICT r7 #1 — the default components/cluster path): identical to
    :func:`portable_grouped_corpus` except ``sig`` carries
    ``corpus_lsh_params(...)[0]`` md5 min-hashes instead of the pinned
    16. Kept as a separate cached frame so the (16, 4) oracle pins
    (``dedup_minhash_portable``, ``llm_corpus_pipeline_portable``) keep
    their exact certified signature while the scaled consumers
    (``dedup_components_portable`` and the cluster readouts) band with
    corpus-sized parameters."""
    key = (spark.sparkContext.applicationId, sf_dir, "spgroups")
    if key not in _CACHE:
        e = enriched_documents(spark, sf_dir)
        members, _ = grouped_corpus(spark, sf_dir)
        nh, _bands = corpus_lsh_params(spark, sf_dir)
        spgroups = _portable_groups_of(e, nh)
        _CACHE[key] = (members, stage_artifact(spgroups, "shared_spgroups"))
    return _CACHE[key]


def _prune_dead_entries() -> None:
    """Drop cache entries whose SparkSession has been stopped — a
    long-lived driver that cycles get_spark()/spark.stop() (repeated
    bench invocations, notebook restarts) must neither accumulate
    handles for dead sessions nor ever be handed a DataFrame bound to a
    stopped SparkContext (a fresh session gets a fresh applicationId,
    so a stale same-key hit is impossible; this is pure leak hygiene).
    Called on cache misses — the cheap path stays dict-lookup-only."""
    dead = []
    for key, val in _CACHE.items():
        df = val[0] if isinstance(val, tuple) else val
        try:
            if df.sparkSession.sparkContext._jsc.sc().isStopped():
                dead.append(key)
        except Exception:  # noqa: BLE001 — unreachable JVM == dead session
            dead.append(key)
    for key in dead:
        _CACHE.pop(key, None)


def clear_cache() -> None:
    """Unpersist and drop all cached frames (tests / session teardown)."""
    for val in _CACHE.values():
        for df in val if isinstance(val, tuple) else (val,):
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — session may already be gone
                pass
    _CACHE.clear()
    _COUNTS.clear()
