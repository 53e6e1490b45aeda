"""Product quantization (PQ) — compressed-domain approximate nearest
neighbor, the third ANN family next to hyperplane LSH
(operators/similarity.py) and IVF cells (operators/ivf.py).

PQ splits each vector into ``m`` contiguous blocks and quantizes every
block to one of ``ksub`` codewords, so a 64-dim float vector becomes
``m`` small integers (here 4 bytes — a 64× compression). Search runs in
the COMPRESSED domain via asymmetric distance computation (ADC): the
query precomputes its distance to every codeword (an m×ksub lookup
table, metadata-sized), and a corpus vector's estimated distance is just
``m`` table lookups + adds — no float vector is ever touched at scan
time. At 100 TB this is why PQ exists: the code column is ~1% of the
embedding column, the scan is table-lookup arithmetic, and the
re-ranking (exact distance) runs only on the short candidate list.

Codebooks here are SEEDED SAMPLES — codeword (j, k) is block j of the
k-th lowest-id vector — the same determinism-over-training choice as
IVF's seeded Lloyd's init, which keeps every stage (codebook, encoding,
ADC estimate, ranking) bit-reproducible by the DuckDB twin
(plans/vector_queries.py::_ann_pq_oracle_sql). A production deployment
would fit codebooks with per-block k-means (operators/ivf.py::
kmeans_fit on block slices — same machinery); encoding/ADC are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import dot, to_double_array


def _block(vec, j: int, sub_dim: int):
    """Block j (1-based slice) of a vector column."""
    return F.slice(vec, j * sub_dim + 1, sub_dim)


def _sq_dist(a, b):
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return dot(diff, diff)


def _codebook_row(
    spark: SparkSession, seeds: list[list[float]], m: int, sub_dim: int
) -> DataFrame:
    """One-row frame carrying the full codebook as
    array<struct<j,k,c>> — broadcast onto corpus (encode) and queries
    (ADC table build). Plan size is independent of m·ksub (codewords
    are DATA, not literals — the IVF lesson)."""
    rows = []
    for j in range(m):
        for k, s in enumerate(seeds):
            rows.append((j, k, [float(x) for x in s[j * sub_dim : (j + 1) * sub_dim]]))
    cdf = spark.createDataFrame(rows, "j INT, k INT, c ARRAY<DOUBLE>")
    return cdf.agg(F.collect_list(F.struct("j", "k", "c")).alias("__cw"))


def pq_encode(
    corpus: DataFrame,
    codebook_row: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "__v",
) -> DataFrame:
    """Attach ``codes`` (array<int>, one codeword id per block):
    code_j = argmin_k d²(block_j, C[j][k]), ties → lowest k. Broadcast
    codebook + pure array expressions — a narrow map, no shuffle."""
    enc = corpus.crossJoin(F.broadcast(codebook_row))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_sort(
            F.transform(
                F.filter("__cw", lambda s: s.getField("j") == j),
                lambda s: F.struct(
                    _sq_dist(
                        F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim),
                        s.getField("c"),
                    ).alias("d"),
                    s.getField("k").alias("k"),
                ),
            )
        )
        .getItem(0)
        .getField("k"),
    )
    return enc.withColumn("codes", codes).drop("__cw")


def pq_search(
    encoded: DataFrame,
    codebook_row: DataFrame,
    queries: DataFrame,
    m: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC top-k against an already-encoded corpus: ``encoded`` carries
    (neighbor_id, __v, codes), ``codebook_row`` the one-row broadcast
    codebook. Shared by the inline :func:`pq_topk` and the
    persisted-index :func:`pq_topk_indexed` (round-trip equivalence
    locked in tests/test_similarity.py). Corpus vectors are scored ONLY
    through their codes (m lookups into the query's precomputed ADC
    table); the exact distance rides along as the re-rank certificate.
    Queries (with their ADC tables) broadcast onto the encoded corpus —
    the corpus never shuffles; the only exchange is the per-query top-k
    window."""
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__q")
    ).crossJoin(F.broadcast(codebook_row))
    adc = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.array_sort(
                F.filter("__cw", lambda s: s.getField("j") == j),
                lambda a, b: a.getField("k") - b.getField("k"),
            ),
            lambda s: _sq_dist(
                F.slice(F.col("__q"), j * sub_dim + 1, sub_dim), s.getField("c")
            ),
        ),
    )
    q = q.withColumn("__adc", adc).drop("__cw")

    pairs = encoded.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    est = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at("__adc", j + 1), F.element_at("codes", j + 1) + 1
        ),
    )
    true_d2 = _sq_dist(F.col("__q"), F.col("__v"))
    w = Window.partitionBy("query_id").orderBy(
        est.asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(est, 6).alias("est_d2"),
            F.round(true_d2, 6).alias("true_d2"),
            "rk",
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, est_d2, true_d2, rk) — inline
    build (deterministic seeded codebook + encode) then
    :func:`pq_search`."""
    spark = corpus.sparkSession
    base = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__v")
    )
    # NULL vectors can't be encoded or ranked — drop them up front so
    # the probe/seeds see only real rows (ADVICE r7: a NULL-first row
    # must not empty a populated corpus)
    base = base.filter(F.col("__v").isNotNull())
    head = base.select("__v").first()
    if head is None or head[0] is None:  # empty corpus: empty top-k
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("est_d2"),
            F.lit(0.0).alias("true_d2"),
            F.lit(1).alias("rk"),
        ).limit(0)
    dim = len(head[0])
    sub_dim = dim // m
    seed_rows = base.orderBy("neighbor_id").limit(ksub).collect()
    seeds = [list(r["__v"]) for r in seed_rows]
    cb = _codebook_row(spark, seeds, m, sub_dim)

    encoded = pq_encode(base, cb, m, sub_dim, vec_col="__v")
    return pq_search(encoded, cb, queries, m, sub_dim, id_col, vec_col, k)


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 16,
) -> None:
    """Persist the PQ index as parquet artifacts (VERDICT r4 #4):
    ``{path}/codebook`` holds (j, k, c) and ``{path}/encoded`` the
    coded corpus (neighbor_id, v, codes) — v kept as the exact re-rank
    certificate. Queries against the artifact NEVER re-encode the
    corpus (plan-asserted: the indexed search reads codes straight off
    the parquet scan, no per-block argmin on the corpus side)."""
    spark = corpus.sparkSession
    base = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__v")
    )
    base = base.filter(F.col("__v").isNotNull())  # ADVICE r7, as in pq_topk
    head = base.select("__v").first()
    if head is None or head[0] is None:
        # empty corpus: schema-bearing empty artifacts so the indexed
        # search still reads + returns empty instead of crashing
        spark.createDataFrame([], "j INT, k INT, c ARRAY<DOUBLE>").write.mode(
            "overwrite"
        ).parquet(f"{path}/codebook")
        base.select(
            "neighbor_id",
            F.col("__v").alias("v"),
            F.array().cast("array<int>").alias("codes"),
        ).write.mode("overwrite").parquet(f"{path}/encoded")
        return
    dim = len(head[0])
    sub_dim = dim // m
    seed_rows = base.orderBy("neighbor_id").limit(ksub).collect()
    seeds = [list(r["__v"]) for r in seed_rows]
    rows = []
    for j in range(m):
        for kk, s in enumerate(seeds):
            rows.append(
                (j, kk, [float(x) for x in s[j * sub_dim : (j + 1) * sub_dim]])
            )
    spark.createDataFrame(rows, "j INT, k INT, c ARRAY<DOUBLE>").write.mode(
        "overwrite"
    ).parquet(f"{path}/codebook")
    cb = _codebook_row(spark, seeds, m, sub_dim)
    pq_encode(base, cb, m, sub_dim, vec_col="__v").select(
        "neighbor_id", F.col("__v").alias("v"), "codes"
    ).write.mode("overwrite").parquet(f"{path}/encoded")


def pq_topk_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Search a persisted :func:`build_pq_index` artifact — identical
    output to the inline :func:`pq_topk` built with the same
    parameters. m and sub_dim are recovered from the codebook artifact
    (one tiny metadata collect — the A1-cell class, not a data
    collect)."""
    cb_df = spark.read.parquet(f"{path}/codebook")
    meta = cb_df.agg(
        (F.max("j") + 1).alias("m"), F.max(F.size("c")).alias("sub_dim")
    ).first()
    if meta["m"] is None:  # index built over an empty corpus
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("est_d2"),
            F.lit(0.0).alias("true_d2"),
            F.lit(1).alias("rk"),
        ).limit(0)
    m, sub_dim = int(meta["m"]), int(meta["sub_dim"])
    cb_row = cb_df.agg(F.collect_list(F.struct("j", "k", "c")).alias("__cw"))
    encoded = spark.read.parquet(f"{path}/encoded").select(
        "neighbor_id", F.col("v").alias("__v"), "codes"
    )
    return pq_search(encoded, cb_row, queries, m, sub_dim, id_col, vec_col, k)
