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


def ann_params_for(
    n_vecs: int,
    threshold: float = 0.9,
    target_bucket: int = 64,
    ntables: int = 4,
    min_recall: float | None = None,
) -> tuple[int, int]:
    """Size (nbits, ntables) for hyperplane LSH over a corpus — the
    VERDICT r7 #3 analog of ``dedup.lsh_params_for``: FIXED nbits keeps
    the bucket count constant, so occupancy grows ∝ n and candidate
    pairs ∝ n² (the measured sf10 defect class of
    ``embedding_neardup_lsh``, exponent 1.61). Sizing
    ``nbits = ceil(log2(n / target_bucket))`` holds expected bucket
    occupancy at ≈ target_bucket regardless of corpus size, so
    candidates per table stay ≈ n·target_bucket/2 — linear in n.

    Recall honesty (the information-theoretic floor, documented rather
    than hidden): a pair at cosine t collides on one hyperplane bit
    with probability p = 1 − arccos(t)/π, so
    recall ≈ 1 − (1 − p^nbits)^ntables FALLS as nbits grows with n.
    At genuine near-dup thresholds (t ≥ 0.95, p ≥ 0.90) the decay is
    slow (p^14 ≈ 0.23 → 4-table recall ≈ 0.65 at n = 10⁶); at weak
    thresholds like 0.4 (p ≈ 0.63) no hyperplane scheme prunes AND
    recalls — sign-collision of a θ-threshold pair is too close to a
    random pair's 0.5/bit (see :func:`neardup_pairs_blocked`'s note;
    the exact blocked path or IVF is the right tool there). This
    helper optimizes for bounded candidates, the property that decides
    whether the job FINISHES at 100 TB; callers needing recall floors
    pass ``min_recall`` and pay linearly in tables.

    ``threshold`` + ``min_recall`` (ADVICE r8 — threshold used to be
    accepted but ignored): with ``min_recall`` set, ``ntables`` is
    RAISED (never lowered below the given ``ntables``) to the
    amplification count that clears the floor for pairs at cosine ≥
    ``threshold`` — ``ceil(log(1 − R) / log(1 − p^nbits))`` with
    p = 1 − arccos(t)/π. With ``min_recall=None`` (default) the given
    ``ntables`` passes through unchanged and ``threshold`` only gates
    validation — the compatibility mode every pinned oracle entry sizes
    under. An unreachable floor (p^nbits so small the table count
    explodes) raises instead of silently returning a 1000-table plan.
    """
    import math

    if not 0 < threshold < 1:
        raise ValueError("need 0 < threshold < 1")
    nbits = max(2, math.ceil(math.log2(max(n_vecs, 2) / target_bucket)))
    if min_recall is not None:
        if not 0 < min_recall < 1:
            raise ValueError("need 0 < min_recall < 1")
        p_bit = 1.0 - math.acos(threshold) / math.pi
        p_table = p_bit**nbits
        needed = math.ceil(math.log(1 - min_recall) / math.log(1 - p_table))
        if needed > 64:
            raise ValueError(
                f"recall floor {min_recall} at threshold {threshold} needs "
                f"{needed} tables at nbits={nbits} (table recall "
                f"{p_table:.4f}) — an amplification count past any "
                "candidate budget; use IVF or the exact blocked path"
            )
        ntables = max(ntables, needed)
    return nbits, ntables


def scaled_ann_params(
    n_vecs: int,
    threshold: float = 0.9,
    target_bucket: int = 64,
    ntables: int = 4,
    min_recall: float | None = None,
) -> tuple[int, int]:
    """:func:`ann_params_for` with the corpus count rounded UP to the
    next power of ten — the decade-stepped seam matching
    ``dedup.scaled_lsh_params``: parameters are a step function of
    corpus magnitude, so oracle entries that pin the gate-scale values
    stay hash-green under small test-corpus drift. At this repo's
    bench scales (dim-64 embeddings): 500 vecs → (4, 4); 2k → (8, 4);
    20k → (11, 4); 200k → (14, 4)."""
    from .dedup import _next_decade

    return ann_params_for(
        _next_decade(n_vecs), threshold, target_bucket, ntables, min_recall
    )


def lsh_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    nbits: int = 8,
    ntables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(id, vec, table, bucket) — one row per (vector, table)."""
    # Probe a NULL-FILTERED first row (ADVICE r7): a NULL vector that
    # happens to scan first must not empty a populated corpus — only a
    # truly empty / all-NULL side short-circuits.
    sample = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if sample is None or sample[0] is None:
        return df.select(
            F.col(id_col).alias("id"),
            to_double_array(vec_col).alias("__v"),
            F.lit(0).alias("table"),
            F.lit(0).alias("bucket"),
        ).limit(0)
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


def _block_pair_sides(d: DataFrame, n_blocks: int) -> tuple[DataFrame, DataFrame]:
    """The shared block-pair layout (used by :func:`neardup_pairs_blocked`
    and :func:`knn_graph_topk`): side A joins every block pair
    (own block, q) for q >= its block; side B every (p, own block) for
    p <= its block — each unordered block pair meets in exactly one
    join group.

    Partition counts are PINNED to the block-pair count: AQE would
    coalesce these exchanges by their (small) pre-join bytes while the
    join fans out O(n²/B²) pairs per group — measured >6 min vs seconds
    at 20k vectors. Hash distribution over n_out partitions is
    approximate (balls-in-bins: expected max load is a small constant
    number of pairs, some partitions empty); the pin's job is defeating
    the coalescing, not a perfect 1:1 layout.
    """
    n_out = n_blocks * (n_blocks + 1) // 2
    a = d.select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__b").alias("p"),
        F.explode(F.sequence(F.col("__b"), F.lit(n_blocks - 1))).alias("q"),
    ).repartition(n_out, "p", "q")
    b = d.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.explode(F.sequence(F.lit(0), F.col("__b"))).alias("p"),
        F.col("__b").alias("q"),
    ).repartition(n_out, "p", "q")
    return a, b


def neardup_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact cosine-threshold pairs via block-pair partitioning — the
    scale-shaped EXACT plan (same output as :func:`neardup_pairs_exact`).

    Exact all-pairs is inherently O(n²) compute; what kills the naive
    crossJoin at 100 TB is *memory and placement*, not FLOPs: one side
    must broadcast, or a single cartesian task sees the whole table.
    Here ids are hashed into ``n_blocks`` blocks and every UNORDERED
    block pair (p ≤ q) becomes one join group: each side replicates its
    rows to the block pairs it participates in (≈ B/2 copies), the join
    key (p, q) spreads B(B+1)/2 groups evenly across the cluster, and a
    task's working set is two blocks — bounded by n/B, tunable, never the
    full table. No broadcast, no driver collect, no skew (hash blocks
    are uniform by construction).

    Note on LSH: an LSH-prefiltered variant (``neardup_pairs_lsh``) can
    prune massively when vectors cluster, but on isotropic noise (this
    repo's synthetic embeddings at θ≈0.4) NO hyperplane scheme has both
    recall 1 and pruning — the sign-collision probability of a
    θ-threshold pair (≈0.63/bit) is too close to that of a random pair
    (0.5/bit). The blocked plan is the honest exact path; LSH is the
    approximate path for clustered data (equality proven on the
    clustered fixture in tests/test_similarity.py).
    """
    d = (
        df.select(F.col(id_col).alias("id"), to_double_array(vec_col).alias("__v"))
        .withColumn("__n", l2_norm(F.col("__v")))
        .withColumn("__b", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)))
    )
    a, b = _block_pair_sides(d, n_blocks)
    denom = F.col("__na") * F.col("__nb")
    sim = F.when(denom != 0, dot(F.col("__va"), F.col("__vb")) / denom)
    # cross-block pairs (p < q) appear exactly once with the lower-block
    # row on the a-side — regardless of id order; intra-block pairs
    # (p == q) appear in both orders, so keep one by id. Output ids are
    # then normalized to (min, max) to match the crossJoin twin.
    return (
        a.join(b, ["p", "q"])
        .filter((F.col("p") < F.col("q")) | (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 8,
    ntables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """LSH-prefiltered near-dup pairs: candidates share a hyperplane
    bucket in ≥1 table, then EXACT cosine refine at ``threshold``.

    Output ⊆ :func:`neardup_pairs_exact` (precision 1 by construction —
    the refine step is exact); recall depends on how clustered the data
    is (see the honesty note on :func:`neardup_pairs_blocked`). On
    genuinely near-duplicate corpora (cosine ≥ 0.9) recall ≈ 1 with
    massive pruning — the right default for dedup at 100 TB.
    """
    bucketed = lsh_bucketed(df, id_col, vec_col, nbits, ntables, seed)
    # pin the join's partitioning to the (table, bucket) key count: the
    # pre-join sides are small by bytes, so AQE coalesces the exchange
    # (measured: TWO tasks carried the whole 50M-pair fan-out at sf1)
    # while the join output is quadratic per bucket — the same
    # fan-out-vs-input-stats lesson as _block_pair_sides
    n_out = ntables * (1 << nbits)
    a = bucketed.select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        "table",
        "bucket",
    ).repartition(n_out, "table", "bucket")
    b = bucketed.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        "table",
        "bucket",
    ).repartition(n_out, "table", "bucket")
    cand = a.join(b, ["table", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("__va"), F.col("__vb"))
    # refine BEFORE the pair dedup: a pair colliding in several tables
    # is duplicated in the candidate stream, but its cosine is the same
    # deterministic value each time, so deduping AFTER the threshold
    # filter is output-identical while the dedup exchange carries only
    # the few QUALIFYING (id_a, id_b, cosine) rows — the former order
    # shuffled every candidate WITH BOTH EMBEDDING VECTORS attached
    # (the r6 sf1 sweep measured 585 s; the refine itself is map-side
    # codegen and costs ntables× at most)
    return (
        cand.withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .dropDuplicates(["id_a", "id_b"])
    )


def knn_graph_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Exact cosine k-NN GRAPH (every vector's k nearest neighbors —
    the kNN join feeding graph clustering, UMAP, label propagation),
    via block-pair partitioning + hierarchical top-k.

    Pairing reuses the :func:`neardup_pairs_blocked` layout (each
    unordered block pair meets in exactly one join group, working set =
    two id-hash blocks), then mirrors each pair into both directed
    roles with an ``explode`` — a NARROW generator, so the join's
    (p, q) hash partitioning survives. That makes stage-1 top-k free of
    shuffle: its window clusters by (p, q, src), which the existing
    (p, q) partitioning already satisfies — Catalyst plans a local sort
    only. Stage 2 re-ranks the ≤ n_blocks·k survivors per source — the
    only pair-sized data NEVER shuffled is the full similarity stream;
    what does shuffle is k·n_blocks rows per vector, independent of n.

    Compute is inherently O(n²/B) per task (exact kNN join); the plan
    bounds MEMORY and SHUFFLE, which is what breaks first at scale.
    Zero-norm vectors have no defined cosine and are excluded up front
    (both as sources and as neighbors), mirroring the oracle's
    norm-positive filter.
    """
    d = (
        df.select(F.col(id_col).alias("id"), to_double_array(vec_col).alias("__v"))
        .withColumn("__n", l2_norm(F.col("__v")))
        .filter(F.col("__n") > 0)
        .withColumn("__b", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)))
    )
    # shared layout incl. the AQE-defeating pinned partition counts —
    # measured at 20k vectors: >560 s coalesced vs 77 s pinned (see
    # _block_pair_sides for the full rationale)
    a, b = _block_pair_sides(d, n_blocks)
    sim = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    # one row per unordered pair (the neardup filter), then explode into
    # both directed roles — narrow, partitioning-preserving
    directed = (
        a.join(b, ["p", "q"])
        .filter((F.col("p") < F.col("q")) | (F.col("id_a") < F.col("id_b")))
        .withColumn("__cos", sim)
        .select(
            "p",
            "q",
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("e"),
            "__cos",
        )
        .select("p", "q", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"), "__cos")
    )
    stage1 = Window.partitionBy("p", "q", "src").orderBy(
        F.col("__cos").desc(), "dst"
    )
    survivors = directed.withColumn(
        "__r1", F.row_number().over(stage1)
    ).filter(F.col("__r1") <= k)
    stage2 = Window.partitionBy("src").orderBy(F.col("__cos").desc(), "dst")
    return (
        survivors.withColumn("rk", F.row_number().over(stage2).cast("int"))
        .filter(F.col("rk") <= k)
        .select("src", "dst", F.round("__cos", 6).alias("cosine"), "rk")
    )
