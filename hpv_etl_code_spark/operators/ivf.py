"""IVF (inverted-file) approximate nearest neighbor — the k-means-based
scale path for similarity search, complementing hyperplane LSH
(operators/similarity.py).

Build: Lloyd's k-means with a FIXED, seeded initialization (centroids
start at the k lowest-id vectors) and a fixed iteration count — fully
deterministic, no RNG in the loop. Each iteration is one shuffle
(groupBy cluster → mean); centroids are collected to the driver between
iterations — k·dim doubles, the same "tiny metadata collect" class as
the reference's A1 cell read (SURVEY §3.1), NOT a data collect.

Search: probe the ``nprobe`` nearest centroids for each query, score
only vectors in probed cells (candidate set ≈ nprobe/k of the corpus),
exact cosine + window top-k. At 100 TB the corpus partition key IS the
cell id — probes prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import dot, l2_norm, to_double_array


def _sq_dist(v: F.Column, c: F.Column) -> F.Column:
    diff = F.zip_with(v, c, lambda a, b: a - b)
    return dot(diff, diff)


def _assign(df: DataFrame, centroids: list[list[float]], vec: str) -> DataFrame:
    """Attach cell = argmin squared distance over the centroid literals."""
    best_cell = F.lit(0)
    best_dist = _sq_dist(F.col(vec), F.array(*[F.lit(x) for x in centroids[0]]))
    for i, c in enumerate(centroids[1:], start=1):
        d = _sq_dist(F.col(vec), F.array(*[F.lit(x) for x in c]))
        better = d < best_dist
        best_cell = F.when(better, F.lit(i)).otherwise(best_cell)
        best_dist = F.when(better, d).otherwise(best_dist)
    return df.withColumn("cell", best_cell)


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 4,
) -> list[list[float]]:
    """Deterministic Lloyd's: seed with the k lowest-id vectors, run a
    fixed number of assign→mean rounds. Returns centroid list."""
    base = df.select(
        F.col(id_col).alias("id"), to_double_array(vec_col).alias("v")
    )
    seed_rows = base.orderBy("id").limit(k).collect()
    centroids = [list(r.v) for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = _assign(base, centroids, "v")
        means = (
            assigned.groupBy("cell")
            .agg(
                *[
                    F.avg(F.element_at("v", i + 1)).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        new = dict()
        for r in means:
            new[r.cell] = [r[f"m{i}"] for i in range(dim)]
        # empty cells keep their previous centroid
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    iterations: int = 4,
) -> DataFrame:
    """IVF search: (query_id, neighbor_id, cosine, rk) over probed cells."""
    centroids = kmeans_fit(corpus, id_col, vec_col, n_cells, iterations)

    c = _assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__vc")
        ),
        centroids,
        "__vc",
    ).withColumn("__nc", l2_norm(F.col("__vc")))

    # queries probe their nprobe nearest cells
    q_base = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__vq")
    ).withColumn("__nq", l2_norm(F.col("__vq")))
    dists = F.array(
        *[
            F.struct(
                _sq_dist(F.col("__vq"), F.array(*[F.lit(x) for x in cc])).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, cc in enumerate(centroids)
        ]
    )
    probed = q_base.withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(F.array_sort(dists), 1, nprobe), lambda s: s.getField("cell")
            )
        ),
    )

    cand = c.join(F.broadcast(probed), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    denom = F.col("__nq") * F.col("__nc")
    sim = F.when(denom != 0, dot(F.col("__vq"), F.col("__vc")) / denom)
    w = Window.partitionBy("query_id").orderBy(sim.desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("cosine"), "rk")
    )
