"""Catalog entries for distributed model training (operators/mlprims.py):
a trained document-quality classifier (full-batch logistic regression)
and top-principal-component PCA over the embeddings table — each
hash-certified against an UNROLLED DuckDB twin, the same certification
pattern as the unrolled-kmeans IVF oracle (plans/vector_queries.py) and
the unrolled-BPE oracle (plans/tokenizer_queries.py).

Why these certify bitwise (see operators/mlprims.py header): per-row
math is IEEE-exact doubles in fixed left-to-right association (the SQL
text and the Column expression tree fold identically), cross-row
reduction is exact DECIMAL(38,18), and the sigmoid is the exp-free
rational form — so the oracle can replay every gradient/power step as a
CTE chain and land on the same doubles before the final ROUND(.., 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import mlprims
from ..sources.registry import load_table
from .fanout import fan_out

# ---------------------------------------------------------------------------
# trained quality classifier: is-English from cheap surface features
# ---------------------------------------------------------------------------

#: (name, DuckDB SQL expression) — the Spark twin in _features() MUST
#: fold the same ops in the same order. ' the '/' and ' occurrence
#: rates are the classic cheap English signal; length and space-ratio
#: give the model a rejectable nuisance dimension.
_FEATS: tuple[tuple[str, str], ...] = (
    (
        "x_the",
        "(length(text) - length(replace(text, ' the ', ''))) / 5.0"
        " * 100.0 / (length(text) + 1.0)",
    ),
    (
        "x_and",
        "(length(text) - length(replace(text, ' and ', ''))) / 5.0"
        " * 100.0 / (length(text) + 1.0)",
    ),
    ("x_len", "length(text) / 1000.0"),
    (
        "x_space",
        "(length(text) - length(replace(text, ' ', '')))"
        " / (length(text) + 1.0)",
    ),
)
_FEAT_NAMES = [n for n, _ in _FEATS]
_W_NAMES = ["w_bias", "w_the", "w_and", "w_len", "w_space"]
_LABEL_SQL = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END"
_ITERS = 4
_LR = 1.0


def _occ_rate(sub: str) -> Column:
    """Occurrences of ``sub`` per 100 chars — mirrors the SQL text."""
    ln = F.length("text")
    return (
        (ln - F.length(F.replace(F.col("text"), F.lit(sub), F.lit(""))))
        / F.lit(float(len(sub)))
        * F.lit(100.0)
        / (ln + F.lit(1.0))
    )


def _features(docs: DataFrame) -> DataFrame:
    ln = F.length("text")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        _occ_rate(" the ").alias("x_the"),
        _occ_rate(" and ").alias("x_and"),
        (ln / F.lit(1000.0)).alias("x_len"),
        (
            (ln - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            / (ln + F.lit(1.0))
        ).alias("x_space"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
    )


def _staged_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`_features` with the extraction run ONCE per query.

    Every classifier entry re-derives the surface features from text in
    each of its 4 gradient jobs plus the final report pass — 5 scans of
    the documents table per query, each re-running the length/replace
    chains (optimization round 9; guide §5 "localCheckpoint is a
    cheaper way to cut lineage" / §3.3 materialize intermediates). The
    narrow ~60 B/row feature frame is locally checkpointed inside the
    query, so the gradient loop and the report aggregate re-read
    checkpointed scalars instead. At 100 TB this is the same call: one
    corpus text scan + a feature-frame materialization beats five text
    scans; nothing is shared across query invocations (each call
    builds, uses, and abandons its own checkpoint — recomputed from
    parquet every run).

    The raw documents scan is fanned out first (round 9, guide §2.5
    input skew): a single-row-group scan runs the length/replace chains
    on ONE task and leaves the checkpoint single-partitioned, so every
    gradient aggregate downstream was serial too. The repartition
    vanishes at production scan sizes (plans/fanout.py)."""
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        ),
        sf_dir,
        "documents",
        key="doc_id",
    )
    return _features(docs).localCheckpoint()


def _sig_sql(z: str) -> str:
    return f"(0.5 + {z} / (2.0 * (1.0 + abs({z}))))"


def _f_cte() -> str:
    feat_sql = ",\n         ".join(f"{sql} AS {n}" for n, sql in _FEATS)
    return f"""f AS (
  SELECT doc_id,
         lang,
         source,
         {feat_sql},
         {_LABEL_SQL} AS y
  FROM documents
)"""


def _logreg_chain(iters: int, tag: str = "", train_where: str = "") -> str:
    """WITH-clause body: f (features+label) then ``iters`` gradient
    stages. {tag}w{i} carries the weights after i updates; an optional
    ``train_where`` restricts the gradient rows (CV folds) without
    touching the shared feature CTE."""
    stages = []
    if not tag:  # the shared feature CTE is emitted once, by the base chain
        stages.append(_f_cte())
    stages.append(
        f"{tag}w0 AS (SELECT "
        + ", ".join(f"0.0 AS {w}" for w in _W_NAMES)
        + ")"
    )
    z_sql = " + ".join(
        ["w_bias"] + [f"{w} * {x}" for w, x in zip(_W_NAMES[1:], _FEAT_NAMES)]
    )
    resid = f"(y - {_sig_sql('z')})"
    src = f"(SELECT * FROM f WHERE {train_where})" if train_where else "f"
    for i in range(1, iters + 1):
        grads = [
            f"SUM(({resid})::DECIMAL(38,18))::DOUBLE / COUNT(*) AS g0"
        ] + [
            f"SUM(({resid} * {x})::DECIMAL(38,18))::DOUBLE / COUNT(*)"
            f" AS g{j + 1}"
            for j, x in enumerate(_FEAT_NAMES)
        ]
        updates = ", ".join(
            f"{w} + {_LR!r} * g{j} AS {w}" for j, w in enumerate(_W_NAMES)
        )
        grads_sql = ",\n         ".join(grads)
        stages.append(
            f"""{tag}g{i} AS (
  SELECT {grads_sql}
  FROM (SELECT s.*, ({z_sql}) AS z FROM {src} s CROSS JOIN {tag}w{i - 1})
),
{tag}w{i} AS (SELECT {updates} FROM {tag}w{i - 1} CROSS JOIN {tag}g{i})"""
        )
    return ",\n".join(stages)


def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression quality/language classifier trained on the
    documents corpus: 4 full-batch GD rounds over 4 surface features,
    labels = (lang = 'en').

    Scale: each round is one narrow scan with a 5-column decimal
    aggregate (map-side combinable — shuffle is #partitions rows); the
    model is a single metadata row per round. At 100 TB this is 4
    sequential scans and nothing else.
    """
    feats = _staged_features(spark, sf_dir)
    w = mlprims.logreg_train(feats, _FEAT_NAMES, "y", _ITERS, _LR)
    z = mlprims.affine(w, [F.col(c) for c in _FEAT_NAMES])
    out = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
        F.round(
            F.avg(
                F.when((z > F.lit(0.0)) == (F.col("y") > F.lit(0.5)), 1.0).otherwise(
                    0.0
                )
            ),
            6,
        ).alias("train_acc"),
    )
    for name, val in zip(_W_NAMES, w):
        out = out.withColumn(name, F.round(F.lit(val), 6))
    return out.select("n_docs", "n_pos", *_W_NAMES, "train_acc")


_Z_FINAL = " + ".join(
    ["w_bias"] + [f"{w} * {x}" for w, x in zip(_W_NAMES[1:], _FEAT_NAMES)]
)

QUALITY_TRAIN_SQL = (
    "WITH "
    + _logreg_chain(_ITERS)
    + f"""
SELECT s.n_docs, s.n_pos, {", ".join(f"ROUND({w}, 6) AS {w}" for w in _W_NAMES)},
       s.train_acc
FROM (
  SELECT COUNT(*)::BIGINT AS n_docs,
         SUM(y)::BIGINT AS n_pos,
         ROUND(AVG(CASE WHEN (z > 0.0) = (y > 0.5) THEN 1.0 ELSE 0.0 END), 6)
           AS train_acc
  FROM (SELECT f.*, ({_Z_FINAL}) AS z FROM f CROSS JOIN w{_ITERS})
) s CROSS JOIN w{_ITERS}
"""
)


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the trained classifier and report the
    per-language mean score and predicted-English rate — the monitoring
    view a corpus pipeline would emit after a trained-filter pass.

    The scoring pass is a pure narrow projection (no shuffle until the
    per-language aggregate); the mean uses an exact decimal sum so the
    report is partitioning-independent.
    """
    feats = _staged_features(spark, sf_dir)
    w = mlprims.logreg_train(feats, _FEAT_NAMES, "y", _ITERS, _LR)
    scored = mlprims.logreg_score(feats, w, _FEAT_NAMES)
    z = mlprims.affine(w, [F.col(c) for c in _FEAT_NAMES])
    return (
        scored.withColumn("pred_en", F.when(z > F.lit(0.0), 1.0).otherwise(0.0))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("score").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.round(F.avg("pred_en"), 6).alias("pred_en_rate"),
        )
        .orderBy("lang")
    )


QUALITY_SCORE_SQL = (
    "WITH "
    + _logreg_chain(_ITERS)
    + f"""
SELECT lang,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(SUM(({_sig_sql("z")})::DECIMAL(38,18))::DOUBLE / COUNT(*), 6)
         AS mean_score,
       ROUND(AVG(CASE WHEN z > 0.0 THEN 1.0 ELSE 0.0 END), 6) AS pred_en_rate
FROM (SELECT f.*, ({_Z_FINAL}) AS z FROM f CROSS JOIN w{_ITERS})
GROUP BY lang
ORDER BY lang
"""
)

def classifier_gated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained filter wired into the corpus pipeline: keep documents
    the classifier scores as English (z > 0) and report per-source
    retention — the audit table a data curator reads after swapping a
    heuristic gate for a trained one.

    Filter + count is one narrow pass after the (metadata-sized)
    training rounds; retention is exact-integer division so the report
    hashes identically everywhere.
    """
    feats = _staged_features(spark, sf_dir)
    w = mlprims.logreg_train(feats, _FEAT_NAMES, "y", _ITERS, _LR)
    z = mlprims.affine(w, [F.col(c) for c in _FEAT_NAMES])
    return (
        feats.withColumn("kept", F.when(z > F.lit(0.0), 1).otherwise(0))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.round(
                F.sum("kept").cast("double") / F.count(F.lit(1)), 6
            ).alias("retention"),
        )
        .orderBy("source")
    )


CLASSIFIER_GATE_SQL = (
    "WITH "
    + _logreg_chain(_ITERS)
    + f"""
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN z > 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       ROUND(SUM(CASE WHEN z > 0.0 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 6)
         AS retention
FROM (SELECT f.*, ({_Z_FINAL}) AS z FROM f CROSS JOIN w{_ITERS})
GROUP BY source
ORDER BY source
"""
)


# ---------------------------------------------------------------------------
# PCA: top principal component of the embeddings table
# ---------------------------------------------------------------------------

#: Pinned like tokenizer_queries.N_MERGES: the testdata embedding width.
_DIM = 64
_PCA_ITERS = 3
_V0 = 1.0 / 8.0  # 1/sqrt(64), exactly representable


def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-coordinate mean and top-principal-component loading of the
    embeddings table (power iteration, no d×d covariance materialized),
    plus the Rayleigh eigenvalue estimate.

    Scale: ``_PCA_ITERS + 1`` scans, each a dim-wide decimal aggregate;
    driver state is one dim-length vector per round. Works unchanged at
    any corpus size because nothing per-row ever leaves the executors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    fit = mlprims.pca_power_iteration(emb, "embedding", _DIM, _PCA_ITERS)
    schema = "dim_idx INT, mu DOUBLE, loading DOUBLE, eigval DOUBLE"
    if fit["n"] == 0:  # empty corpus: empty report, not 64 fabricated rows
        return spark.createDataFrame([], schema)
    # round via F.round (HALF_UP, matching SQL ROUND), not Python's
    # banker's round — a half-even/half-away tie would hash-diverge
    rows = [
        (j + 1, fit["mu"][j], fit["v"][j], fit["eigval"]) for j in range(_DIM)
    ]
    return spark.createDataFrame(rows, schema).select(
        "dim_idx",
        F.round("mu", 6).alias("mu"),
        F.round("loading", 6).alias("loading"),
        F.round("eigval", 6).alias("eigval"),
    )


def _centered_sql() -> str:
    return ", ".join(
        f"(embedding[{j + 1}])::DOUBLE - mu{j} AS c{j}" for j in range(_DIM)
    )


def _power_stages(tag: str, src: str, iters: int) -> list[str]:
    """CTE stages {tag}b{i}/{tag}u{i}/{tag}v{i} power-iterating over
    ``src`` (a CTE name or parenthesized subquery yielding columns
    c0..c{dim-1}) from the fixed 1/sqrt(dim) start — the SQL mirror of
    operators/mlprims.py::_power_loop."""
    dims = range(_DIM)
    d_expr = " + ".join(f"c{j} * vv{j}" for j in dims)
    stages = []
    for i in range(1, iters + 1):
        if i == 1:
            vv = ", ".join(f"{_V0!r} AS vv{j}" for j in dims)
            rows = f"SELECT s.*, {vv} FROM {src} s"
        else:
            rows = f"SELECT s.*, v.* FROM {src} s CROSS JOIN {tag}v{i - 1} v"
        u_sums = ",\n         ".join(
            f"SUM((c{j} * d)::DECIMAL(38,18))::DOUBLE / COUNT(*) AS u{j}"
            for j in dims
        )
        norm = " + ".join(f"u{j} * u{j}" for j in dims)
        stages.append(
            f"""{tag}b{i} AS (
  SELECT *, ({d_expr}) AS d FROM ({rows})
),
{tag}u{i} AS (
  SELECT {u_sums}
  FROM {tag}b{i}
),
{tag}v{i} AS (
  SELECT {", ".join(f"u{j} / nn AS vv{j}" for j in dims)}, nn
  FROM {tag}u{i} CROSS JOIN (SELECT sqrt({norm}) AS nn FROM {tag}u{i})
)"""
        )
    return stages


def _pca_chain(iters: int) -> str:
    mu_sums = ",\n         ".join(
        f"SUM((embedding[{j + 1}])::DECIMAL(38,18))::DOUBLE / COUNT(*) AS mu{j}"
        for j in range(_DIM)
    )
    stages = [f"m AS (\n  SELECT {mu_sums}\n  FROM embeddings\n)"]
    src = f"(SELECT {_centered_sql()} FROM embeddings CROSS JOIN m)"
    stages.extend(_power_stages("", src, iters))
    return ",\n".join(stages)


def pca_top2_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top two principal components (power iteration + deflation): the
    second loop runs on the persisted residual ``c - (c·v1)·v1``, so
    the cost is two phases of the same linear scans, never a d×d
    covariance. Degenerate (rank-≤1) corpora keep v2 at the start
    vector with eigval2 = 0 on the Spark side; the certified tables are
    full-rank so the SQL twin never divides by a zero norm.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    fit = mlprims.pca_two_components(emb, "embedding", _DIM, _PCA_ITERS)
    schema = (
        "dim_idx INT, loading1 DOUBLE, loading2 DOUBLE,"
        " eigval1 DOUBLE, eigval2 DOUBLE"
    )
    if fit["n"] == 0:
        return spark.createDataFrame([], schema)
    rows = [
        (j + 1, fit["v"][j], fit["v2"][j], fit["eigval"], fit["eigval2"])
        for j in range(_DIM)
    ]
    return spark.createDataFrame(rows, schema).select(
        "dim_idx",
        F.round("loading1", 6).alias("loading1"),
        F.round("loading2", 6).alias("loading2"),
        F.round("eigval1", 6).alias("eigval1"),
        F.round("eigval2", 6).alias("eigval2"),
    )


def _pca2_chain(iters: int) -> str:
    """Like _pca_chain + a residual phase — but the centered and
    residual frames are MATERIALIZED CTEs: default-inlined CTEs re-scan
    embeddings.parquet once per power stage, and six stages' worth of
    parallel parquet readers ran DuckDB out of file handles. Same rows,
    same values — only the evaluation strategy is pinned (this mirrors
    the Spark side's persist() of exactly these two frames)."""
    dims = range(_DIM)
    d_expr = " + ".join(f"c{j} * vv{j}" for j in dims)
    resid = ", ".join(f"c{j} - d * vv{j} AS c{j}" for j in dims)
    mu_sums = ",\n         ".join(
        f"SUM((embedding[{j + 1}])::DECIMAL(38,18))::DOUBLE / COUNT(*) AS mu{j}"
        for j in dims
    )
    stages = [
        f"m AS (\n  SELECT {mu_sums}\n  FROM embeddings\n)",
        f"c AS MATERIALIZED (\n  SELECT {_centered_sql()}"
        "\n  FROM embeddings CROSS JOIN m\n)",
    ]
    stages.extend(_power_stages("", "c", iters))
    stages.append(
        f"""rb AS (
  SELECT *, ({d_expr}) AS d
  FROM (SELECT s.*, v.* FROM c s CROSS JOIN v{iters} v)
),
r AS MATERIALIZED (
  SELECT {resid} FROM rb
)"""
    )
    stages.extend(_power_stages("q", "r", iters))
    return ",\n".join(stages)


PCA2_SQL = (
    "WITH "
    + _pca2_chain(_PCA_ITERS)
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT {j + 1} AS dim_idx, ROUND(a.vv{j}, 6) AS loading1,"
        f" ROUND(b.vv{j}, 6) AS loading2, ROUND(a.nn, 6) AS eigval1,"
        f" ROUND(b.nn, 6) AS eigval2"
        f" FROM v{_PCA_ITERS} a CROSS JOIN qv{_PCA_ITERS} b"
        for j in range(_DIM)
    )
    + "\nORDER BY dim_idx"
)


PCA_SQL = (
    "WITH "
    + _pca_chain(_PCA_ITERS)
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT {j + 1} AS dim_idx, ROUND(mu{j}, 6) AS mu,"
        f" ROUND(vv{j}, 6) AS loading, ROUND(nn, 6) AS eigval"
        f" FROM m CROSS JOIN v{_PCA_ITERS}"
        for j in range(_DIM)
    )
    + "\nORDER BY dim_idx"
)


def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multivariate OLS (price ~ quantity + discount over
    lineitem) by normal equations + Cramer's rule — exact distributed
    linear algebra with NO driver round-trips at all: one scan
    accumulates the 10 sufficient statistics as exact decimal sums, and
    the 3×3 solve is ordinary Column arithmetic on the single aggregate
    row. Deterministic for the usual reasons (exact sums, fixed-
    association IEEE doubles), so the full fit hashes identically in
    DuckDB.

    At 100 TB this is ONE map-side-combinable pass; the d×d normal
    matrix stays closed-form practical through d≈3–4 (beyond that,
    gradient descent — logreg_train's machinery — is the scale path).
    Production note: raw second moments of large values overflow
    DECIMAL(38,18)'s 20 integer digits around 10²⁰ — center/scale
    features first at extreme row counts (the sf10 sweep is ~10¹⁷).
    """
    return _normal_eq_fit(spark, sf_dir, lam=None)


#: Ridge penalty for the regularized twin — large enough that the
#: discount coefficient visibly shrinks toward 0 at the gate scale.
_RIDGE_LAM = 1000.0


def ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression in closed form: the SAME one-scan sufficient
    statistics as :func:`ols_normal_equations`, with λ added to the
    feature diagonal of the normal matrix before the Cramer solve
    (intercept unpenalized, the standard convention). Demonstrates that
    regularized fits are a pure post-aggregation algebra change — zero
    extra passes over the data.
    """
    return _normal_eq_fit(spark, sf_dir, lam=_RIDGE_LAM)


def _normal_eq_fit(spark: SparkSession, sf_dir: str, lam: float | None) -> DataFrame:
    # The 11 exact-decimal sufficient statistics are pure map-side
    # compute, but a one-row-group parquet scan runs as ONE task — fan
    # the narrow (x1, x2, y) projection out across the cores before the
    # decimal casts so the aggregation parallelizes (guide §2.5 input
    # skew; exact sums are partitioning-independent, so the fit is
    # bit-identical; the repartition vanishes at production scan sizes).
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            F.col("l_quantity").cast("double").alias("x1"),
            F.col("l_discount").cast("double").alias("x2"),
            F.col("l_extendedprice").cast("double").alias("y"),
            F.col("l_orderkey").alias("__k"),
        ),
        sf_dir,
        "lineitem",
        key="__k",
    ).drop("__k")

    def dsum(c: Column) -> Column:
        return F.sum(c.cast("decimal(38,18)")).cast("double")

    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(x1 * x1).alias("s11"),
        dsum(x1 * x2).alias("s12"),
        dsum(x2 * x2).alias("s22"),
        dsum(y).alias("sy"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
        dsum(y * y).alias("syy"),
    )
    nd, s1, s2 = F.col("nd"), F.col("s1"), F.col("s2")
    s12 = F.col("s12")
    sy, s1y, s2y, syy = F.col("sy"), F.col("s1y"), F.col("s2y"), F.col("syy")
    # ridge adds lam to the feature diagonal; same association as the
    # SQL twin's (s11 + lam) text
    if lam is None:
        s11, s22 = F.col("s11"), F.col("s22")
    else:
        s11 = F.col("s11") + F.lit(lam)
        s22 = F.col("s22") + F.lit(lam)
    # Cramer expansions — SAME text/association as the SQL twin below
    det = (
        nd * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        nd * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        nd * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    solved = s.select(
        "n",
        (det0 / det).alias("b0"),
        (det1 / det).alias("b1"),
        (det2 / det).alias("b2"),
        *[c for c in ("nd", "sy", "s1y", "s2y", "syy")],
    )
    b0, b1, b2 = F.col("b0"), F.col("b1"), F.col("b2")
    sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = syy - sy * sy / nd
    return solved.select(
        F.col("n").alias("n_rows"),
        F.round(b0, 6).alias("b_intercept"),
        F.round(b1, 6).alias("b_quantity"),
        F.round(b2, 6).alias("b_discount"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2"),
    )


def _normal_eq_sql(lam: float | None) -> str:
    s11 = "s11" if lam is None else f"(s11 + {lam!r})"
    s22 = "s22" if lam is None else f"(s22 + {lam!r})"
    return f"""
WITH li AS (
  SELECT l_quantity::DOUBLE AS x1, l_discount::DOUBLE AS x2,
         l_extendedprice::DOUBLE AS y
  FROM lineitem
),
s AS (
  SELECT COUNT(*)::BIGINT AS n, COUNT(*)::DOUBLE AS nd,
         SUM((x1)::DECIMAL(38,18))::DOUBLE AS s1,
         SUM((x2)::DECIMAL(38,18))::DOUBLE AS s2,
         SUM((x1 * x1)::DECIMAL(38,18))::DOUBLE AS s11,
         SUM((x1 * x2)::DECIMAL(38,18))::DOUBLE AS s12,
         SUM((x2 * x2)::DECIMAL(38,18))::DOUBLE AS s22,
         SUM((y)::DECIMAL(38,18))::DOUBLE AS sy,
         SUM((x1 * y)::DECIMAL(38,18))::DOUBLE AS s1y,
         SUM((x2 * y)::DECIMAL(38,18))::DOUBLE AS s2y,
         SUM((y * y)::DECIMAL(38,18))::DOUBLE AS syy
  FROM li
),
d AS (
  SELECT n, nd, sy, s1y, s2y, syy,
    (sy * ({s11} * {s22} - s12 * s12)
      - s1 * (s1y * {s22} - s12 * s2y)
      + s2 * (s1y * s12 - {s11} * s2y))
    / (nd * ({s11} * {s22} - s12 * s12)
      - s1 * (s1 * {s22} - s12 * s2)
      + s2 * (s1 * s12 - {s11} * s2)) AS b0,
    (nd * (s1y * {s22} - s12 * s2y)
      - sy * (s1 * {s22} - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2))
    / (nd * ({s11} * {s22} - s12 * s12)
      - s1 * (s1 * {s22} - s12 * s2)
      + s2 * (s1 * s12 - {s11} * s2)) AS b1,
    (nd * ({s11} * s2y - s1y * s12)
      - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - {s11} * s2))
    / (nd * ({s11} * {s22} - s12 * s12)
      - s1 * (s1 * {s22} - s12 * s2)
      + s2 * (s1 * s12 - {s11} * s2)) AS b2
  FROM s
)
SELECT n AS n_rows,
       ROUND(b0, 6) AS b_intercept,
       ROUND(b1, 6) AS b_quantity,
       ROUND(b2, 6) AS b_discount,
       ROUND(1.0 - (syy - (b0 * sy + b1 * s1y + b2 * s2y))
                   / (syy - sy * sy / nd), 6) AS r2
FROM d
"""


OLS_NORMAL_SQL = _normal_eq_sql(None)
RIDGE_NORMAL_SQL = _normal_eq_sql(_RIDGE_LAM)


_CV_FOLDS = 3


def quality_classifier_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free k-fold cross-validation of the trained filter:
    deterministic folds (doc_id % k), one model per held-out fold,
    accuracy measured ONLY on rows the model never saw. The honest
    eval a trained-gate deployment decision needs — train_acc from
    quality_classifier_train is optimistic by construction.

    Cost: k × the training scans (each on (k-1)/k of the corpus) plus
    one scoring pass per fold; everything else is the family's usual
    exact-sum machinery, so the whole table hash-certifies.
    """
    feats = _staged_features(spark, sf_dir)
    out = None
    for k in range(_CV_FOLDS):
        train = feats.filter((F.col("doc_id") % _CV_FOLDS) != k)
        test = feats.filter((F.col("doc_id") % _CV_FOLDS) == k)
        w = mlprims.logreg_train(train, _FEAT_NAMES, "y", _ITERS, _LR)
        z = mlprims.affine(w, [F.col(c) for c in _FEAT_NAMES])
        fold_row = test.agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.avg(
                    F.when(
                        (z > F.lit(0.0)) == (F.col("y") > F.lit(0.5)), 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias("test_acc"),
        ).select(F.lit(k).alias("fold"), "n_test", "test_acc")
        out = fold_row if out is None else out.unionByName(fold_row)
    return out.orderBy("fold")


def _cv_sql(iters: int) -> str:
    tags = [f"cv{k}_" for k in range(_CV_FOLDS)]
    chains = [_f_cte()]
    chains.extend(
        _logreg_chain(
            iters, tag=tags[k], train_where=f"doc_id % {_CV_FOLDS} <> {k}"
        )
        for k in range(_CV_FOLDS)
    )
    selects = []
    for k in range(_CV_FOLDS):
        selects.append(
            f"""SELECT {k} AS fold, COUNT(*)::BIGINT AS n_test,
       ROUND(AVG(CASE WHEN (z > 0.0) = (y > 0.5) THEN 1.0 ELSE 0.0 END), 6)
         AS test_acc
FROM (SELECT s.*, ({_Z_FINAL}) AS z
      FROM (SELECT * FROM f WHERE doc_id % {_CV_FOLDS} = {k}) s
      CROSS JOIN {tags[k]}w{iters})"""
        )
    return (
        "WITH "
        + ",\n".join(chains)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY fold"
    )


def quality_scores_stream_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train offline, score online: the trained classifier applied to
    ``documents`` replayed as a 4-file availableNow stream, with the
    per-language report aggregated BY THE STREAMING ENGINE
    (complete-mode state: exact decimal score sums + exact counts).

    Because scoring is a deterministic narrow projection and the
    aggregate state is exact (order-independent), the final streaming
    result is BIT-IDENTICAL to the batch ``quality_classifier_score`` —
    so this entry is hash-certified by the SAME DuckDB oracle, making
    it the trained-model family's end-to-end streaming-execution
    correctness probe.
    """
    import uuid

    from ..streaming.stream import run_to_memory_sink
    from .stream_queries import _table_replay_stream

    feats_b = _staged_features(spark, sf_dir)
    w = mlprims.logreg_train(feats_b, _FEAT_NAMES, "y", _ITERS, _LR)

    stream = _table_replay_stream(
        spark, sf_dir, "documents", ("doc_id", "text", "lang", "source"),
        ("doc_id", "text", "lang", "source"),
    )
    feats_s = _features(stream)
    scored = mlprims.logreg_score(feats_s, w, _FEAT_NAMES)
    z = mlprims.affine(w, [F.col(c) for c in _FEAT_NAMES])
    agg = (
        scored.withColumn("pred_en", F.when(z > F.lit(0.0), 1.0).otherwise(0.0))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("score").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.round(F.avg("pred_en"), 6).alias("pred_en_rate"),
        )
    )
    sink = f"quality_scores_sink_{uuid.uuid4().hex[:8]}"
    run_to_memory_sink(agg, sink, output_mode="complete")
    return (
        spark.table(sink)
        .select("lang", "n_docs", "mean_score", "pred_en_rate")
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# multiclass: one-vs-rest language classifier, trained in one scan/round
# ---------------------------------------------------------------------------

#: Pinned like _DIM: the testdata language set, sorted. The CASE
#: tie-break order below follows this tuple in BOTH engines.
_LANGS = ("de", "en", "es", "fr", "zh")


def _features_multi(docs: DataFrame) -> DataFrame:
    out = _features(docs)
    for lang in _LANGS:
        out = out.withColumn(
            f"y_{lang}", F.when(F.col("lang") == lang, 1.0).otherwise(0.0)
        )
    return out


def _logreg_multi_chain(iters: int) -> tuple[str, str]:
    """Unrolled one-vs-rest chain: w{i} carries the flattened C×(d+1)
    weight matrix (w_c{c}_{j}, j=0 bias), each g{i} computes all
    C·(d+1) gradient means from ONE pass over f."""
    feat_sql = ",\n         ".join(f"{sql} AS {n}" for n, sql in _FEATS)
    y_sql = ",\n         ".join(
        f"CASE WHEN lang = '{lang}' THEN 1.0 ELSE 0.0 END AS y_{lang}"
        for lang in _LANGS
    )
    n_cls = len(_LANGS)
    d = len(_FEAT_NAMES)
    wnames = [f"w_c{c}_{j}" for c in range(n_cls) for j in range(d + 1)]
    stages = [
        f"""f AS (
  SELECT lang,
         source,
         {feat_sql},
         {y_sql}
  FROM documents
)""",
        "w0 AS (SELECT " + ", ".join(f"0.0 AS {w}" for w in wnames) + ")",
    ]
    z_exprs = ",\n           ".join(
        "("
        + " + ".join(
            [f"w_c{c}_0"]
            + [f"w_c{c}_{j + 1} * {x}" for j, x in enumerate(_FEAT_NAMES)]
        )
        + f") AS z{c}"
        for c in range(n_cls)
    )
    for i in range(1, iters + 1):
        grads = []
        for c, lang in enumerate(_LANGS):
            resid = f"(y_{lang} - {_sig_sql(f'z{c}')})"
            grads.append(
                f"SUM(({resid})::DECIMAL(38,18))::DOUBLE / COUNT(*)"
                f" AS g{c}_0"
            )
            grads.extend(
                f"SUM(({resid} * {x})::DECIMAL(38,18))::DOUBLE / COUNT(*)"
                f" AS g{c}_{j + 1}"
                for j, x in enumerate(_FEAT_NAMES)
            )
        updates = ", ".join(
            f"w_c{c}_{j} + {_LR!r} * g{c}_{j} AS w_c{c}_{j}"
            for c in range(n_cls)
            for j in range(d + 1)
        )
        grads_sql = ",\n         ".join(grads)
        stages.append(
            f"""g{i} AS (
  SELECT {grads_sql}
  FROM (SELECT f.*,
           {z_exprs}
        FROM f CROSS JOIN w{i - 1})
),
w{i} AS (SELECT {updates} FROM w{i - 1} CROSS JOIN g{i})"""
        )
    return ",\n".join(stages), z_exprs


def lang_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest language classifier and its confusion matrix.

    The distributed-design point: all C per-class gradient vectors are
    aggregated in the SAME scan each round (C·(d+1) map-side-combinable
    decimal sums), so training C models costs the I/O of one. The
    prediction is argmax_c z_c with class-order tie-break, expressed
    identically in both engines (greatest + ordered CASE on
    bitwise-identical doubles).
    """
    # same one-extraction-pass staging as _staged_features (the 4
    # one-vs-rest gradient rounds + confusion pass re-read checkpointed
    # scalars instead of re-deriving features from text 5×)
    feats = _features_multi(load_table(spark, sf_dir, "documents")).localCheckpoint()
    ws = mlprims.logreg_train_multi(
        feats, _FEAT_NAMES, [f"y_{lang}" for lang in _LANGS], _ITERS, _LR
    )
    zs = [
        mlprims.affine(ws[c], [F.col(x) for x in _FEAT_NAMES])
        for c in range(len(_LANGS))
    ]
    m = F.greatest(*zs)
    pred = F.when(zs[0] == m, _LANGS[0])
    for c in range(1, len(_LANGS)):
        pred = pred.when(zs[c] == m, _LANGS[c])
    return (
        feats.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def _lang_confusion_sql(iters: int) -> str:
    chain, z_exprs = _logreg_multi_chain(iters)
    pred = (
        "CASE "
        + " ".join(
            f"WHEN z{c} = m THEN '{lang}'" for c, lang in enumerate(_LANGS)
        )
        + " END"
    )
    greatest = ", ".join(f"z{c}" for c in range(len(_LANGS)))
    return (
        "WITH "
        + chain
        + f"""
SELECT lang, {pred} AS pred_lang, COUNT(*)::BIGINT AS n_docs
FROM (
  SELECT *, greatest({greatest}) AS m FROM (
    SELECT f.lang,
           {z_exprs}
    FROM f CROSS JOIN w{iters}
  )
)
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""
    )


#: Histogram bucket width for the projection report. Projections of the
#: centered testdata embeddings land in roughly [-3, 3]; 0.25 gives a
#: few dozen buckets at any sf (the report stays metadata-sized).
_BUCKET = 0.25


def pca_projection_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the fitted top component: project every embedding onto it
    and report the projection histogram — the 'did the transform do
    anything' monitoring view after a PCA fit.

    The projection pass is a pure narrow map (no shuffle until the
    bucket count); floor on bitwise-identical doubles buckets
    identically in both engines, and the per-bucket mean is an exact
    decimal sum. Empty corpus → empty report.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    fit = mlprims.pca_power_iteration(emb, "embedding", _DIM, _PCA_ITERS)
    schema = "bucket BIGINT, n_vecs BIGINT, mean_proj DOUBLE"
    if fit["n"] == 0:
        return spark.createDataFrame([], schema)
    x = [F.element_at("embedding", j + 1).cast("double") for j in range(_DIM)]
    p = (x[0] - F.lit(fit["mu"][0])) * F.lit(fit["v"][0])
    for j in range(1, _DIM):
        p = p + (x[j] - F.lit(fit["mu"][j])) * F.lit(fit["v"][j])
    return (
        emb.select(F.floor(p / F.lit(_BUCKET)).alias("bucket"), p.alias("p"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum(F.col("p").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_proj"),
        )
        .orderBy("bucket")
    )


_PROJ_EXPR = " + ".join(
    f"((embedding[{j + 1}])::DOUBLE - mu{j}) * vv{j}" for j in range(_DIM)
)

PCA_PROJ_SQL = (
    "WITH "
    + _pca_chain(_PCA_ITERS)
    + f"""
SELECT floor(p / {_BUCKET!r})::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_vecs,
       ROUND(SUM(p::DECIMAL(38,18))::DOUBLE / COUNT(*), 6) AS mean_proj
FROM (
  SELECT ({_PROJ_EXPR}) AS p
  FROM embeddings CROSS JOIN m CROSS JOIN v{_PCA_ITERS}
)
GROUP BY bucket
ORDER BY bucket
"""
)


def register_entries(register) -> None:  # noqa: ANN001
    register(
        "quality_classifier_train",
        quality_classifier_train,
        QUALITY_TRAIN_SQL,
        headline=True,
    )
    register("quality_classifier_score", quality_classifier_score, QUALITY_SCORE_SQL)
    register("classifier_gated_corpus", classifier_gated_corpus, CLASSIFIER_GATE_SQL)
    register("quality_classifier_cv", quality_classifier_cv, _cv_sql(_ITERS))
    register(
        "lang_classifier_confusion",
        lang_classifier_confusion,
        _lang_confusion_sql(_ITERS),
    )
    # streaming execution, same oracle: bit-identical to the batch twin
    register(
        "quality_scores_stream_final", quality_scores_stream_final, QUALITY_SCORE_SQL
    )
    register(
        "ols_normal_equations", ols_normal_equations, OLS_NORMAL_SQL, headline=True
    )
    register("ridge_normal_equations", ridge_normal_equations, RIDGE_NORMAL_SQL)
    register("pca_top_component", pca_top_component, PCA_SQL)
    register("pca_top2_components", pca_top2_components, PCA2_SQL)
    register("pca_projection_hist", pca_projection_hist, PCA_PROJ_SQL)
