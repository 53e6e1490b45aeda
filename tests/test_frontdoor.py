"""The front-door dedup API (round 9, VERDICT r8 #6): method policy,
decision-record invariants on every method, and agreement with the
certified primitives it composes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.frontdoor import dedup, resolve_dedup_method
from hpv_etl_code_spark.sources.registry import load_table


def test_method_policy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    # auto: column type first, then corpus magnitude
    assert resolve_dedup_method(vecs, "embedding") == "semantic"
    assert resolve_dedup_method(docs, "text") == "shingles"
    assert resolve_dedup_method(docs, "text", n_rows=200_000) == "minhash"
    # explicit methods pass through; type mismatches fail loudly
    assert resolve_dedup_method(docs, "text", "exact") == "exact"
    with pytest.raises(ValueError, match="does not apply"):
        resolve_dedup_method(docs, "text", "semantic")
    with pytest.raises(ValueError, match="does not apply"):
        resolve_dedup_method(vecs, "embedding", "minhash")
    with pytest.raises(ValueError, match="method must be"):
        resolve_dedup_method(docs, "text", "fuzzy")


def _check_records(out, n_rows):
    """The decision-record contract: one row per input, cluster is the
    family minimum, exactly one keeper per family and it IS the
    minimum."""
    rows = out.collect()
    assert len(rows) == n_rows
    assert len({r.id for r in rows}) == n_rows
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cl, members in by_cluster.items():
        assert cl == min(m.id for m in members)
        keepers = [m for m in members if m.is_keeper == 1]
        assert len(keepers) == 1 and keepers[0].id == cl


@pytest.mark.parametrize("method", ["exact", "minhash", "shingles"])
def test_text_records_contract(spark, sf_dir, method):
    docs = load_table(spark, sf_dir, "documents")
    out = dedup(docs, "text", method=method)
    _check_records(out, docs.count())


def test_semantic_records_contract(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    out = dedup(vecs, "embedding", id_col="vec_id", threshold=0.4)
    _check_records(out, vecs.count())


def test_exact_method_matches_exact_dedup_keepers(spark, sf_dir):
    """`method='exact'` must realize exactly the certified
    exact_dedup_keepers families (same fingerprint, same keeper)."""
    from hpv_etl_code_spark.operators.dedup import exact_dedup_keepers

    docs = load_table(spark, sf_dir, "documents")
    out = dedup(docs, "text", method="exact")
    ref = exact_dedup_keepers(docs, "text", "doc_id")
    assert {(r.keeper_id, r.n_dups) for r in ref.collect()} == {
        (r.cluster, r.n)
        for r in out.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out.filter("is_keeper = 1").count() == ref.count()


def test_fast_and_portable_agree_on_sure_things(spark):
    """The two hash families may differ in LSH candidate recall, but on
    a corpus of exact duplicates + clearly-distinct docs both must find
    the same families — and identical texts must always co-cluster."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1
            (5, "alpha beta gamma delta epsilon zeta"),  # dup of 1
            (3, "one two three four five six seven"),
            (4, "unrelated words entirely different here now"),
        ],
        ["doc_id", "text"],
    )
    for fam in ("fast", "portable"):
        out = {r.id: (r.cluster, r.is_keeper) for r in dedup(
            df, "text", method="shingles", hash_family=fam, n_rows=5
        ).collect()}
        assert out[1] == (1, 1) and out[2] == (1, 0) and out[5] == (1, 0)
        assert out[3] == (3, 1) and out[4] == (4, 1)
    with pytest.raises(ValueError, match="hash_family"):
        dedup(df, "text", method="minhash", hash_family="md5", n_rows=5)


def test_short_docs_stay_singletons_under_shingles(spark):
    """Documents shorter than the shingle width have EMPTY shingle sets;
    jaccard([],[]) = 0 < threshold, so they must not co-cluster (the
    documented flat-path contract) — while exact dedup DOES fold them."""
    df = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")],
        ["doc_id", "text"],
    )
    near = {r.id: r.cluster for r in dedup(
        df, "text", method="shingles", n_rows=3
    ).collect()}
    assert near == {1: 1, 2: 2, 3: 3}
    exact = {r.id: r.cluster for r in dedup(
        df, "text", method="exact", n_rows=3
    ).collect()}
    assert exact == {1: 1, 2: 1, 3: 3}


def test_frontdoor_matches_components_fast_families(spark, sf_dir):
    """On the bench corpus, the fast text path's non-singleton families
    must be exactly the certified dedup_components_fast labeling (same
    composition, generalized to label every row)."""
    from hpv_etl_code_spark.plans.text_queries import dedup_components_fast

    docs = load_table(spark, sf_dir, "documents")
    out = dedup(docs, "text", method="minhash", threshold=0.8)
    fams = {
        (r.id, r.cluster)
        for r in out.join(
            # non-singleton families only (components output covers
            # edge-touched + multi-member identical groups)
            out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")),
            "cluster",
        )
        .filter("n >= 2")
        .select("id", "cluster")
        .collect()
    }
    ref = {
        (r.doc_id, r.component)
        for r in dedup_components_fast(spark, sf_dir).collect()
    }
    assert fams == ref
