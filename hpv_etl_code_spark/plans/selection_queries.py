"""DSIR data-selection catalog entries (operators/dsir.py) — importance
weights, Gumbel top-k resampling, and the resulting mixture shift, each
with a DuckDB oracle twin.

The target "domain sample" is carved deterministically from the
documents table — English docs with ``doc_id % 5 = 0`` play the
curated target corpus (the way decontam_queries' ``% 50`` split plays
the eval suite); everything else is the raw pool being selected from.
Both engines rebuild the split, the hashed-gram features (portable
60-bit md5), the Laplace-smoothed bucket models, and the hashed-uniform
Gumbel noise bit-for-bit, so all three entries hash-certify.

Reference scope note: the reference (src/main.py:1-141) has no
data-selection stage; this family is part of the mandated LLM-pipeline
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dsir
from ..sources.registry import load_table
from .fanout import fan_out

#: resample size for the top-k entries.
K = 100

def _is_target():  # Column factory — lazy so import needs no JVM
    return (F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)


def _weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared head → (doc_id, n_grams, logw_micro).

    Optimization round 9: fit and score now share ONE explode+md5 pass
    through ``dsir.doc_bucket_counts`` — the old split head ran the
    per-gram md5 chain three times per query (score scan, λ counts,
    λ totals; plans/r09/dsir_resample_topk_before.txt shows the three
    Generate subtrees). The shared (doc, bucket) exchange is reused by
    both re-aggregations (ReuseExchange), and the scan is fanned out so
    the hash chain uses every core instead of the single task a
    one-row-group parquet scan yields (guide §2.5 input skew; the
    repartition vanishes at production input sizes)."""
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        ),
        sf_dir,
        "documents",
        key="doc_id",
    )
    dc = dsir.doc_bucket_counts(docs, "text", "doc_id", _is_target())
    lam = dsir.importance_lambda(dsir.bucket_counts_from(dc))
    return dsir.doc_logweights_from(dc, "doc_id", lam)


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight over the raw pool.

    Two corpus scans total (fit + score), a B-row broadcast between
    them, exact integer accumulation — see operators/dsir.py for the
    100 TB shape. The ORDER BY is presentational."""
    w = _weights(spark, sf_dir)
    return w.select(
        "doc_id",
        "n_grams",
        F.round(F.col("logw_micro") / dsir.MICRO, 6).alias("logw"),
    ).orderBy("doc_id")


def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-k selection (sampling without replacement ∝ w(d)) —
    the noise is hashed-uniform so the draw is reproducible; the limit
    runs as TakeOrdered, not a global sort."""
    sel = dsir.gumbel_topk(_weights(spark, sf_dir), "doc_id", K)
    return sel.select(
        "doc_id",
        F.round(F.col("logw_micro") / dsir.MICRO, 6).alias("logw"),
        F.round(F.col("key_micro") / dsir.MICRO, 6).alias("gumbel_key"),
    ).orderBy(F.desc("gumbel_key"), "doc_id")


#: per-stratum resample size for the stratified entry.
K_PER_LANG = 20


def dsir_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Gumbel top-k — stratified selection with a fixed
    budget per stratum, the shape used when the selected set must keep
    a mixture contract regardless of where the importance mass lands
    (DoReMi-style domain budgets meet DSIR weights). One shuffle to
    attach the stratum key, one per-stratum sort for the row_number;
    each stratum's winners are k rows, so the result stays broadcast-
    sized downstream."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    keyed = _weights(spark, sf_dir).withColumn(
        "key_micro", F.col("logw_micro") + dsir.gumbel_key_micro("doc_id")
    )
    win = Window.partitionBy("lang").orderBy(F.desc("key_micro"), "doc_id")
    return (
        keyed.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= K_PER_LANG)
        .select(
            "lang",
            "doc_id",
            F.round(F.col("logw_micro") / dsir.MICRO, 6).alias("logw"),
            F.round(F.col("key_micro") / dsir.MICRO, 6).alias("gumbel_key"),
            "rk",
        )
        .orderBy("lang", "rk")
    )


def dsir_mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after language mixture of the selected set — DSIR's
    effect made observable. Honesty note: the synthetic corpus shares
    ONE vocabulary across languages, so its importance distribution is
    near-flat and ``pct_sel`` tracks ``pct_raw`` here; the actual
    mixture shift is proved on a corpus with real domain signal in
    tests/test_dsir.py::test_selection_shifts_toward_target. The
    selected side is k rows, so every join here broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    sel = dsir.gumbel_topk(_weights(spark, sf_dir), "doc_id", K)
    raw_mix = (
        docs.filter(~_is_target())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_raw"))
    )
    sel_mix = (
        docs.join(F.broadcast(sel.select("doc_id")), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sel"))
    )
    total_raw = raw_mix.agg(F.sum("n_raw").alias("tot"))
    return (
        raw_mix.join(sel_mix, "lang", "left")
        .crossJoin(F.broadcast(total_raw))
        .select(
            "lang",
            "n_raw",
            F.coalesce("n_sel", F.lit(0)).alias("n_sel"),
            F.round(F.col("n_raw") / F.col("tot"), 6).alias("pct_raw"),
            F.round(F.coalesce("n_sel", F.lit(0)) / float(K), 6).alias(
                "pct_sel"
            ),
        )
        .orderBy("lang")
    )


def dsir_scores_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit offline, score online: the λ table is fitted on the batch
    corpus, then ``documents`` replays as a 4-file availableNow stream
    and the STREAMING ENGINE accumulates the per-language importance
    mass — ``(lang, n_grams, sum_logw)`` with exact integer micro-unit
    state, so the final result is bit-identical to the batch aggregate
    of ``dsir_importance_weights`` and hash-certifies against the same
    oracle chain. One stateful aggregate: per-gram λ contributions sum
    straight to the language totals (Σ_docs logw = Σ_grams λ), so no
    per-doc intermediate state is ever held. The λ side is a B-row
    broadcast into a stream-static join — the steady-state ingest shape
    where a frozen selection model scores arriving batches."""
    import uuid

    from ..streaming.stream import run_to_memory_sink
    from .stream_queries import _table_replay_stream

    docs = load_table(spark, sf_dir, "documents")
    lam = dsir.importance_lambda(
        dsir.bucket_counts(docs, "text", _is_target())
    )
    stream = _table_replay_stream(
        spark, sf_dir, "documents", ("doc_id", "text", "lang", "source"),
        ("doc_id", "text", "lang", "source"),
    )
    grams = stream.filter(~_is_target()).select(
        "lang",
        F.explode(
            dsir.hashed_grams(F.coalesce(F.col("text"), F.lit("")))
        ).alias("bucket"),
    )
    agg = (
        grams.join(F.broadcast(lam), "bucket")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.round(
                F.sum("lam_micro").cast("bigint") / dsir.MICRO, 6
            ).alias("sum_logw"),
        )
    )
    sink = f"dsir_scores_sink_{uuid.uuid4().hex[:8]}"
    run_to_memory_sink(agg, sink, output_mode="complete")
    return (
        spark.table(sink)
        .select("lang", "n_grams", "sum_logw")
        .orderBy("lang")
    )


#: DuckDB bigram list for a split-text column ``ts`` (empty when the
#: doc has a single token — same guard as textops.word_ngrams(n=2)).
_D_BIGRAMS = "[ts[i]||'_'||ts[i+1] for i in range(1, greatest(len(ts), 1))]"

#: shared oracle head: split → hashed grams → bucket models → λ →
#: per-doc exact micro-unit log-weights over the raw pool.
_W_CTE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
),
grams AS (
  SELECT doc_id, (lang = 'en' AND doc_id % 5 = 0) AS is_t,
         unnest(ts || {_D_BIGRAMS}) AS gram
  FROM toks
),
b AS (
  SELECT doc_id, is_t,
         ('0x' || substr(md5('f|' || gram), 1, 15))::BIGINT % 64 AS bucket
  FROM grams
),
cnt AS (
  SELECT bucket,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
  FROM b GROUP BY bucket
),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
lam AS (
  SELECT bucket,
         CAST(ROUND((LN((ct + 1.0) / (tt + 64.0))
                   - LN((cr + 1.0) / (tr + 64.0))) * 1000000) AS BIGINT)
           AS lam_micro
  FROM cnt CROSS JOIN tot
),
db AS (
  SELECT doc_id, bucket, COUNT(*) AS n
  FROM b WHERE NOT is_t GROUP BY doc_id, bucket
),
sc AS (
  SELECT doc_id, SUM(n)::BIGINT AS n_grams,
         SUM(n * lam_micro)::BIGINT AS logw_micro
  FROM db JOIN lam USING (bucket) GROUP BY doc_id
),
w AS (
  SELECT d.doc_id,
         COALESCE(sc.n_grams, 0)::BIGINT AS n_grams,
         COALESCE(sc.logw_micro, 0)::BIGINT AS logw_micro,
         d.lang
  FROM documents d LEFT JOIN sc USING (doc_id)
  WHERE NOT (d.lang = 'en' AND d.doc_id % 5 = 0)
),
g AS (
  SELECT doc_id, lang, n_grams, logw_micro,
         logw_micro + CAST(ROUND(-LN(-LN(
           (('0x' || substr(md5('u|' || doc_id), 1, 15))::BIGINT + 0.5)
             / 1152921504606846976.0)) * 1000000) AS BIGINT) AS key_micro
  FROM w
)
"""

DSIR_WEIGHTS_SQL = f"""{_W_CTE}
SELECT doc_id, n_grams, ROUND(logw_micro / 1000000.0, 6) AS logw
FROM w ORDER BY doc_id
"""

DSIR_TOPK_SQL = f"""{_W_CTE}
SELECT doc_id, ROUND(logw_micro / 1000000.0, 6) AS logw,
       ROUND(key_micro / 1000000.0, 6) AS gumbel_key
FROM g ORDER BY key_micro DESC, doc_id LIMIT {K}
"""

DSIR_MIXTURE_SQL = f"""{_W_CTE},
sel AS (
  SELECT doc_id, lang FROM g ORDER BY key_micro DESC, doc_id LIMIT {K}
),
raw_mix AS (SELECT lang, COUNT(*) AS n_raw FROM w GROUP BY lang),
sel_mix AS (SELECT lang, COUNT(*) AS n_sel FROM sel GROUP BY lang),
totr AS (SELECT SUM(n_raw) AS tot FROM raw_mix)
SELECT r.lang, r.n_raw::BIGINT AS n_raw,
       COALESCE(s.n_sel, 0)::BIGINT AS n_sel,
       ROUND(r.n_raw * 1.0 / totr.tot, 6) AS pct_raw,
       ROUND(COALESCE(s.n_sel, 0) / {float(K)}, 6) AS pct_sel
FROM raw_mix r LEFT JOIN sel_mix s USING (lang) CROSS JOIN totr
ORDER BY r.lang
"""


DSIR_STRATIFIED_SQL = f"""{_W_CTE}
SELECT lang, doc_id, logw, gumbel_key, rk FROM (
  SELECT lang, doc_id,
         ROUND(logw_micro / 1000000.0, 6) AS logw,
         ROUND(key_micro / 1000000.0, 6) AS gumbel_key,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY key_micro DESC, doc_id) AS rk
  FROM g)
WHERE rk <= {K_PER_LANG}
ORDER BY lang, rk
"""


DSIR_STREAM_SQL = f"""{_W_CTE}
SELECT lang, SUM(n_grams)::BIGINT AS n_grams,
       ROUND(SUM(logw_micro) / 1000000.0, 6) AS sum_logw
FROM w GROUP BY lang ORDER BY lang
"""


def register_entries(register) -> None:  # noqa: ANN001
    register("dsir_importance_weights", dsir_importance_weights, DSIR_WEIGHTS_SQL)
    register("dsir_stratified_topk", dsir_stratified_topk, DSIR_STRATIFIED_SQL)
    register("dsir_scores_stream_final", dsir_scores_stream_final, DSIR_STREAM_SQL)
    register("dsir_resample_topk", dsir_resample_topk, DSIR_TOPK_SQL, headline=True)
    register("dsir_mixture_shift", dsir_mixture_shift, DSIR_MIXTURE_SQL)
