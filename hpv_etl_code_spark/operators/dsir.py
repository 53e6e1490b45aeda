"""Data selection via importance resampling (DSIR) — hashed-n-gram
importance weights and Gumbel top-k selection, Spark-first.

The method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023 — public) picks raw-corpus
documents that look like a small TARGET domain sample:

1. featurize every document as a bag of hashed unigrams+bigrams over
   ``B`` buckets;
2. fit two Laplace-smoothed bucket-multinomial models — one on the
   target sample, one on the raw corpus;
3. score each raw document with the importance log-weight
   ``log w(d) = Σ_b n_d[b] · (log p̂_target[b] − log p̂_raw[b])``;
4. resample without replacement via Gumbel top-k on
   ``log w(d) + Gumbel(0,1)``.

Scale shape (the 100 TB story):

- **Fit is ONE corpus scan** ending in a ``B``-row aggregate — the
  explode dies executor-side into a map-side-combinable
  ``groupBy(bucket)``; the shuffle carries ≤ ``B × #partitions``
  partial rows regardless of corpus size.
- **Scoring is ONE more scan**: per-(doc, bucket) counts (partial
  aggregation again), then a BROADCAST join against the ``B``-row
  λ table and a per-doc sum. No corpus-sized side ever shuffles twice.
- **Selection is a top-k** (``TakeOrdered``) — no global sort.

Determinism / oracle parity: all hashing is the repo's portable
60-bit-md5 family (``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT``), and the per-doc weight is
accumulated in EXACT integer micro-units (λ rounded to 1e-6 once,
then integer ``Σ n·λ_micro``) so the sum is order-independent and
hash-identical across engines — the same decimal-accumulate discipline
as operators/mlprims.py. The Gumbel noise is derived from
``md5('u|' || doc_id)`` so the "randomness" is reproducible by any
engine with md5.

Reference scope note: the reference pipeline (src/main.py:1-141) has
no data-selection stage; this module is part of the mandated
LLM-training-data extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import tokens, word_ngrams

#: feature-space size (hash buckets) — small enough that the fitted
#: model is a broadcast row set, large enough to separate the synthetic
#: corpus's vocabulary; 100 TB runs would raise this (the plan shape is
#: independent of B: the λ side stays a broadcast until B ~ 10^8).
N_BUCKETS = 64

#: micro-unit scale for exact integer accumulation of log-weights.
MICRO = 1_000_000

#: 2^60 — the portable hash is 60 bits of md5.
HASH_SPACE = 1 << 60


def portable_hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT — identical in
    DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (same family
    as operators/dedup.py::_portable minhash)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hashed_grams(text_col: Column | str) -> Column:
    """Unigram+bigram bag hashed to ``N_BUCKETS`` buckets — an
    array<bigint> of per-gram bucket ids (duplicates preserved: DSIR
    features are COUNTS, not sets)."""
    unigrams = tokens(text_col)
    grams = F.concat(unigrams, word_ngrams(text_col, 2))
    return F.transform(
        grams,
        lambda g: F.pmod(
            portable_hash60(F.concat(F.lit("f|"), g)), F.lit(N_BUCKETS)
        ),
    )


def bucket_counts(docs: DataFrame, text_col: str, is_target: Column) -> DataFrame:
    """One corpus scan → ``(bucket, ct_target, ct_raw)``, ≤ B rows.

    The explode feeds a partial-aggregated ``groupBy(bucket)`` with
    conditional sums, so both models are fitted in the SAME pass and the
    shuffle is B-bounded.
    """
    e = docs.select(
        is_target.alias("is_t"),
        F.explode(hashed_grams(text_col)).alias("bucket"),
    )
    return e.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct_target"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("ct_raw"),
    )


def doc_bucket_counts(
    docs: DataFrame, text_col: str, id_col: str, is_target: Column
) -> DataFrame:
    """``(id, is_t, bucket, n)`` — gram counts per (document, bucket),
    ONE explode+hash pass shared by BOTH the fit and the score side
    (optimization round 9: the split fit/score paths each re-ran the
    per-gram md5 chain — the engine's single most expensive expression
    — so one query paid the hash three times: score scan, λ counts,
    λ totals. Aggregating to (doc, bucket) first makes every consumer a
    re-aggregation of this one exchange, which ReuseExchange
    deduplicates into a single physical pass).

    Equivalent inputs produce equivalent models: per-bucket totals are
    ``Σ_docs n`` and per-doc gram counts are ``Σ_buckets n`` — exact
    integer re-aggregations of the same explode this function's callers
    used to run directly (the oracle's ``db`` CTE is literally this
    table). Size: ≤ |docs| × B narrow rows before partial aggregation,
    so the exchange carries strictly less than the raw gram stream.
    """
    e = docs.select(
        F.col(id_col),
        is_target.alias("is_t"),
        F.explode(
            hashed_grams(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("bucket"),
    )
    return e.groupBy(id_col, "is_t", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def bucket_counts_from(doc_counts: DataFrame) -> DataFrame:
    """Fit-side re-aggregation of :func:`doc_bucket_counts` →
    ``(bucket, ct_target, ct_raw)``, ≤ B rows — integer-exact, so the
    fitted model is bit-identical to :func:`bucket_counts` on the same
    corpus."""
    return doc_counts.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("is_t"), F.col("n")).otherwise(F.lit(0))
        ).alias("ct_target"),
        F.sum(
            F.when(F.col("is_t"), F.lit(0)).otherwise(F.col("n"))
        ).alias("ct_raw"),
    )


def importance_lambda(counts: DataFrame) -> DataFrame:
    """Per-bucket importance log-ratio in micro-units:
    ``λ_micro[b] = round(1e6 · (ln p̂_t[b] − ln p̂_r[b]))`` with +1
    Laplace smoothing over ``N_BUCKETS`` buckets. ≤ B rows — always a
    broadcast side downstream."""
    # totals via an unbounded window over the ≤ B count rows rather than
    # a crossJoin against a separate ``counts.agg(...)`` subtree: the
    # agg variant duplicated the whole counts lineage (scan + explode +
    # per-gram md5) into the totals branch, which Spark re-executed —
    # the λ table cost two corpus passes instead of one (optimization
    # round 9; plan-verified). The window runs on the already-aggregated
    # ≤ B rows in a single tiny partition; the sums are exact integers,
    # so λ is bit-identical.
    from pyspark.sql import Window

    w = Window.partitionBy()
    tot_t = F.sum("ct_target").over(w)
    tot_r = F.sum("ct_raw").over(w)
    lam = (
        F.log((F.col("ct_target") + 1.0) / (tot_t + float(N_BUCKETS)))
        - F.log((F.col("ct_raw") + 1.0) / (tot_r + float(N_BUCKETS)))
    )
    return counts.select(
        "bucket",
        F.round(lam * MICRO).cast("bigint").alias("lam_micro"),
    )


def doc_logweights(
    corpus: DataFrame, text_col: str, id_col: str, lam: DataFrame
) -> DataFrame:
    """Per-document importance log-weight: ``(id, n_grams, logw_micro)``.

    Second (and last) corpus scan: explode → BROADCAST λ join (≤ B
    rows) → ONE per-doc aggregate. All of a document's grams live in
    its own input row, so partial aggregation finishes each doc
    map-side and the single exchange carries one (id, 2×bigint) row
    per doc — no corpus-sized shuffle. No doc can vanish: ``split``
    yields one (empty) token even for blank/NULL text (coalesced to
    ''), so every doc has ≥ 1 gram — the inner joins are total
    (invariant pinned in tests/test_dsir.py). The per-doc sum is exact
    integer arithmetic — order-independent, so the hash gate can
    certify it."""
    e = corpus.select(
        F.col(id_col),
        F.explode(
            hashed_grams(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("bucket"),
    )
    return (
        e.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lam_micro").cast("bigint").alias("logw_micro"),
        )
    )


def doc_logweights_from(
    doc_counts: DataFrame, id_col: str, lam: DataFrame
) -> DataFrame:
    """Score-side re-aggregation of :func:`doc_bucket_counts`:
    ``(id, n_grams, logw_micro)`` for the raw (non-target) pool via a
    B-row broadcast λ join — ``n_grams = Σ n`` and
    ``logw_micro = Σ n·λ_micro`` are exact integer re-associations of
    the per-gram sums :func:`doc_logweights` computes, so the weights
    are bit-identical while the corpus is scanned ZERO extra times
    (the shared exchange is reused)."""
    raw = doc_counts.filter(~F.col("is_t"))
    return (
        raw.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * F.col("lam_micro"))
            .cast("bigint")
            .alias("logw_micro"),
        )
    )


def gumbel_key_micro(id_col: Column | str) -> Column:
    """Reproducible Gumbel(0,1) noise in micro-units from the portable
    hash of the id: ``u = (h + 0.5) / 2^60`` (strictly inside (0,1)),
    ``g = −ln(−ln u)`` — the exact inverse-CDF sample, just with hashed
    rather than drawn uniforms, so DuckDB replays it bit-for-bit."""
    h = portable_hash60(F.concat(F.lit("u|"), F.col(id_col).cast("string")))
    u = (h + F.lit(0.5)) / F.lit(float(HASH_SPACE))
    return F.round(-F.log(-F.log(u)) * MICRO).cast("bigint")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Front door: pick the ``k`` raw-corpus documents that look most
    like the ``target`` sample — fit both bucket models (one combined
    scan), score the raw pool (one more scan + a B-row broadcast), and
    Gumbel-top-k resample. Returns ``(id, n_grams, logw_micro,
    key_micro)`` for the selected rows; join back on ``id`` for the
    payloads. ``target`` is typically tiny (a curated domain sample) —
    it rides along the fit scan via a union, never a join. The two
    frames must be DISJOINT row sets: rows present in both would count
    twice in the raw model's denominator (pass
    ``raw.join(target, id, 'left_anti')`` first when the target was
    carved out of the pool, as the catalog entries do with their
    ``doc_id % 5`` split)."""
    tagged = raw.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("__t")
    ).unionByName(
        target.select(
            F.col(id_col), F.col(text_col), F.lit(True).alias("__t")
        )
    )
    # one explode+hash pass serves fit AND score (see doc_bucket_counts)
    dc = doc_bucket_counts(tagged, text_col, id_col, F.col("__t"))
    lam = importance_lambda(bucket_counts_from(dc))
    weights = doc_logweights_from(dc, id_col, lam)
    return gumbel_topk(weights, id_col, k)


def gumbel_topk(weights: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gumbel top-k resampling: ``key = logw + Gumbel`` (micro-units,
    integer add — exact), take the k largest. Equivalent to sampling k
    docs WITHOUT replacement with probability ∝ w(d) (the Gumbel-max
    trick); the ORDER BY runs as ``TakeOrdered`` — no global sort
    stage, driver receives k rows."""
    keyed = weights.withColumn(
        "key_micro", F.col("logw_micro") + gumbel_key_micro(id_col)
    )
    return keyed.orderBy(F.desc("key_micro"), id_col).limit(k)
