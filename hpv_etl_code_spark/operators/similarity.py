"""Similarity search over embedding columns: brute-force exact top-k and
a hyperplane-LSH approximate variant.

Scale design (north star, BASELINE.json):

- **Brute force** is the correctness baseline AND the right answer when
  the query set is small: broadcast the queries, scan the corpus once —
  no shuffle of the big side, O(|corpus|·|queries|) FLOPs, embarrassingly
  parallel. Top-k per query is a window over the (small) score set.
- **Hyperplane LSH (ANN)** is the scale path for large query sets or
  self-search: bucket vectors by the sign pattern of random projections
  (cosine-LSH), join on bucket, score only candidates. ``ntables``
  independent tables trade compute for recall. Hyperplanes come from a
  seeded RNG → fully deterministic plans.

Everything is native array expressions (functions/vector.py); at large
``nbits·dim`` a Pandas-UDF matmul becomes preferable (Arrow-batched BLAS)
— that pattern is demonstrated in operators/multimodal.py instead.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, l2_norm, to_double_array


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rk)."""
    # norms are precomputed per side: array folds are interpreted
    # (CodegenFallback), so evaluating ONE dot per pair instead of three
    # cuts the hot-loop cost ~3× with bit-identical results
    # (multiplication is commutative-exact in IEEE).
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(vec_col).alias("__vc"),
    ).withColumn("__nc", l2_norm(F.col("__vc")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(vec_col).alias("__vq"),
    ).withColumn("__nq", l2_norm(F.col("__vq")))
    scored = c.crossJoin(F.broadcast(q))
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    denom = F.col("__nq") * F.col("__nc")
    sim = F.when(denom != 0, dot(F.col("__vq"), F.col("__vc")) / denom)
    w = Window.partitionBy("query_id").orderBy(
        sim.desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("cosine"), "rk")
    )


def _hyperplanes(dim: int, nbits: int, ntables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(ntables, nbits, dim)


def _bucket_key(vec: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: Σ (dot(v, h_i) > 0) << i."""
    key = F.lit(0)
    for i, h in enumerate(planes):
        h_lit = F.array(*[F.lit(float(x)) for x in h])
        key = key + F.when(dot(vec, h_lit) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


def lsh_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    nbits: int = 8,
    ntables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(id, vec, table, bucket) — one row per (vector, table)."""
    sample = df.select(vec_col).first()
    dim = len(sample[0])
    planes = _hyperplanes(dim, nbits, ntables, seed)
    v = to_double_array(vec_col)
    tagged = df.select(F.col(id_col).alias("id"), v.alias("__v"))
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                _bucket_key(F.col("__v"), planes[t]).alias("bucket"),
            )
            for t in range(ntables)
        ]
    )
    return tagged.select("id", "__v", F.explode(buckets).alias("b")).select(
        "id", "__v", F.col("b.table").alias("table"), F.col("b.bucket").alias("bucket")
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 8,
    ntables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 table,
    then exact cosine + window rank. Output shape = brute_force_topk
    (queries with < k candidates return fewer rows — by design)."""
    cb = lsh_bucketed(corpus, id_col, vec_col, nbits, ntables, seed).select(
        F.col("id").alias("neighbor_id"),
        F.col("__v").alias("__vc"),
        "table",
        "bucket",
    )
    qb = lsh_bucketed(queries, id_col, vec_col, nbits, ntables, seed).select(
        F.col("id").alias("query_id"),
        F.col("__v").alias("__vq"),
        "table",
        "bucket",
    )
    cand = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine(F.col("__vq"), F.col("__vc"))
    w = Window.partitionBy("query_id").orderBy(sim.desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("cosine"), "rk")
    )


def neardup_pairs_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — exact O(n²) self-join; the
    correctness baseline. At scale, generate candidates with
    lsh_bucketed() first (same refine step, strictly fewer pairs)."""
    d = df.select(
        F.col(id_col).alias("id"), to_double_array(vec_col).alias("__v")
    ).withColumn("__n", l2_norm(F.col("__v")))
    a = d.select(F.col("id").alias("id_a"), F.col("__v").alias("__va"), F.col("__n").alias("__na"))
    b = d.select(F.col("id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb"))
    denom = F.col("__na") * F.col("__nb")
    sim = F.when(denom != 0, dot(F.col("__va"), F.col("__vb")) / denom)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
