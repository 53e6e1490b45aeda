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


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, est_d2, true_d2, rk).

    Corpus vectors are scored ONLY through their codes (m lookups into
    the query's precomputed ADC table); the exact distance rides along
    as the re-rank certificate. Queries (with their ADC tables)
    broadcast onto the encoded corpus — the corpus never shuffles; the
    only exchange is the per-query top-k window."""
    spark = corpus.sparkSession
    base = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_double_array(vec_col).alias("__v")
    )
    dim = len(base.select("__v").first()[0])
    sub_dim = dim // m
    seed_rows = base.orderBy("neighbor_id").limit(ksub).collect()
    seeds = [list(r["__v"]) for r in seed_rows]
    cb = _codebook_row(spark, seeds, m, sub_dim)

    encoded = pq_encode(base, cb, m, sub_dim, vec_col="__v")

    # query-side ADC tables: adc[j][k] = d²(query block j, codeword jk)
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__q")
    ).crossJoin(F.broadcast(cb))
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
