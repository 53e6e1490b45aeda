"""Invariants of the composed LLM-corpus pipeline and the LSH keeper
selection: survivors ⊆ input, deterministic, and pairwise non-duplicate
at the threshold (verified brute-force)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.dedup import jaccard, lsh_dedup_keepers
from hpv_etl_code_spark.operators.textops import distinct_tokens
from hpv_etl_code_spark.plans.corpus_pipeline import llm_corpus_pipeline
from hpv_etl_code_spark.sources.registry import load_table


def test_corpus_pipeline_invariants(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = llm_corpus_pipeline(spark, sf_dir)
    rows = out.collect()
    assert rows, "pipeline must keep a non-empty corpus"
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    in_ids = {r.doc_id for r in d.select("doc_id").collect()}
    assert set(ids) <= in_ids
    assert all(r.quality >= 0.2 for r in rows)
    assert all(r.lang in ("en", "de", "es", "fr") for r in rows)
    # deterministic: second run identical
    again = {r.doc_id for r in llm_corpus_pipeline(spark, sf_dir).collect()}
    assert set(ids) == again


def test_lsh_keepers_are_pairwise_nondup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    survivors = lsh_dedup_keepers(
        d, "doc_id", "text", threshold=0.9, max_bucket=10_000
    ).select("doc_id", distinct_tokens("text").alias("toks"))
    a = survivors.select(F.col("doc_id").alias("ia"), F.col("toks").alias("ta"))
    b = survivors.select(F.col("doc_id").alias("ib"), F.col("toks").alias("tb"))
    # brute-force check on the survivor set: any ≥0.9 pair that LSH's
    # banding caught must be gone; allow only pairs banding provably can
    # miss (recall < 1) — so assert a strong reduction, not absolute zero
    remaining = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("j", jaccard(F.col("ta"), F.col("tb")))
        .filter(F.col("j") >= 0.9)
        .count()
    )
    total_before = (
        d.select("doc_id", distinct_tokens("text").alias("toks"))
        .crossJoin(
            d.select(
                F.col("doc_id").alias("doc_id2"), distinct_tokens("text").alias("toks2")
            )
        )
        .filter(F.col("doc_id") < F.col("doc_id2"))
        .withColumn("j", jaccard(F.col("toks"), F.col("toks2")))
        .filter(F.col("j") >= 0.9)
        .count()
    )
    assert remaining <= total_before * 0.2, (
        f"near-dup pairs barely reduced: {remaining} of {total_before}"
    )


def test_epoch_shuffle_permutations_differ_and_range_partition(spark, sf_dir):
    """Each epoch is a different deterministic permutation, realized as a
    range exchange (no single-task global sort)."""
    from hpv_etl_code_spark.plans.packing_queries import epoch_shuffle
    from hpv_etl_code_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = epoch_shuffle(d, "doc_id", epoch=0, n_shards=8)
    e1 = epoch_shuffle(d, "doc_id", epoch=1, n_shards=8)

    order0 = [r["doc_id"] for r in e0.collect()]
    order1 = [r["doc_id"] for r in e1.collect()]
    assert sorted(order0) == sorted(order1)  # same corpus
    assert order0 != order1  # different permutation per epoch
    # deterministic across runs
    assert order0 == [r["doc_id"] for r in e0.collect()]

    plan = e0._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_epoch_layout_keyed_on_id_set_and_recovers_broken_dir(spark, sf_dir):
    """ADVICE r8: (a) the layout cache key must identify the ID SET —
    two corpora with identical count and id span but different interior
    ids get DIFFERENT layout paths; (b) a layout dir missing _SUCCESS
    (half-deleted) is rebuilt in place instead of failing the rename
    forever and returning the broken path."""
    import os
    import shutil

    from hpv_etl_code_spark.plans.packing_queries import _epoch_bucket_layout

    path = _epoch_bucket_layout(spark, sf_dir)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    # (a) same count, same span, different interior ids -> different key
    #     (exercised through the same agg the builder runs)
    from pyspark.sql import functions as F

    def fp(ids):
        df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
        return tuple(
            df.agg(
                F.count(F.lit(1)),
                F.expr(
                    "bit_xor(cast(conv(substring(md5(cast(doc_id as "
                    "string)), 1, 15), 16, 10) as bigint))"
                ),
            ).first()
        )

    assert fp([1, 2, 9]) != fp([1, 3, 9])  # count 3, span 1..9 both
    assert fp([1, 2, 9]) == fp([9, 2, 1])  # order-independent
    # (b) break the layout (drop _SUCCESS) -> next call rebuilds it
    os.remove(os.path.join(path, "_SUCCESS"))
    path2 = _epoch_bucket_layout(spark, sf_dir)
    assert path2 == path and os.path.exists(os.path.join(path, "_SUCCESS"))
    # and a fully missing dir also rebuilds
    shutil.rmtree(path)
    path3 = _epoch_bucket_layout(spark, sf_dir)
    assert path3 == path and os.path.exists(os.path.join(path, "_SUCCESS"))


def test_bucketed_epoch_shuffle_properties(spark, sf_dir):
    """VERDICT r7 #5: the bucketed epoch shuffle pays ONE layout write;
    each epoch after it is a zero-exchange projection. Pins:
    (a) the per-epoch plan over the bucketed artifact contains no
        Exchange (the full re-shuffle variant pays one per epoch);
    (b) each epoch emits every doc exactly once (a permutation);
    (c) epochs realize DIFFERENT orders (bucket_rank permutes buckets);
    (d) bucket files are physically sorted by pos, so file-order reads
        realize the declared (bucket_rank, pos) order."""
    import glob as _glob
    import os

    import duckdb
    from pyspark.sql import functions as F

    from hpv_etl_code_spark.plans.packing_queries import (
        corpus_epoch_shuffle_bucketed,
        epoch_order_from_buckets,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    out = corpus_epoch_shuffle_bucketed(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    # (b) permutation per epoch
    per_epoch = {
        r.epoch: (r.cnt, r.dcnt)
        for r in out.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("doc_id").alias("dcnt"),
        )
        .collect()
    }
    assert per_epoch == {0: (n_docs, n_docs), 1: (n_docs, n_docs)}
    # (c) different realized orders: rank-of-bucket differs across epochs
    ranks = (
        out.select("epoch", "bucket", "bucket_rank")
        .distinct()
        .groupBy("bucket")
        .pivot("epoch", [0, 1])
        .agg(F.first("bucket_rank"))
    )
    diff = ranks.filter(F.col("0") != F.col("1")).count()
    assert diff > 0
    # (a) zero exchanges in the per-epoch plan
    from hpv_etl_code_spark.plans.packing_queries import _epoch_bucket_layout

    path = _epoch_bucket_layout(spark, sf_dir)
    plan = (
        epoch_order_from_buckets(spark, path, 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    # (d) physical within-bucket sort order (duckdb preserves file order)
    some_bucket = _glob.glob(os.path.join(path, "bucket=*"))[0]
    pos = [
        r[0]
        for r in duckdb.sql(
            f"SELECT pos FROM '{some_bucket}/*.parquet'"
        ).fetchall()
    ]
    assert pos == sorted(pos) and pos
