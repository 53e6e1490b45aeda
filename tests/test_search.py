"""BM25 retrieval and MAD-outlier tests: scoring semantics, ranking
determinism, and the plan shapes that make both scale (no corpus
explode, top-k via TakeOrderedAndProject, per-group stats broadcast).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans.search_queries import (
    BM25_TERMS,
    BM25_TOP_K,
    bm25_topk_docs,
    mad_outliers_events,
)
from hpv_etl_code_spark.sources.registry import load_table


def test_bm25_scores_positive_and_bounded_k(spark, sf_dir):
    top = bm25_topk_docs(spark, sf_dir).collect()
    assert 0 < len(top) <= BM25_TOP_K
    assert all(r.bm25 > 0 for r in top)
    # descending with doc_id tiebreak
    keys = [(-r.bm25, r.doc_id) for r in top]
    assert keys == sorted(keys)


def test_bm25_top_doc_contains_query_term(spark, sf_dir):
    top = bm25_topk_docs(spark, sf_dir).limit(1).collect()[0]
    text = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == top.doc_id)
        .select("text")
        .first()
        .text
    )
    assert any(t in text.split(" ") for t in BM25_TERMS)


def test_bm25_plan_never_explodes_corpus(spark, sf_dir):
    plan = (
        bm25_topk_docs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort
    assert "Generate" not in plan  # tf via array scan, no explode
    assert "SortMergeJoin" not in plan  # stats broadcast back


def test_mad_outliers_are_extreme_within_group(spark, sf_dir):
    out = mad_outliers_events(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    checked = out.join(med, "event_type").filter(
        F.abs(F.col("value") - F.col("med")) <= 0  # outlier AT the median
    )
    assert checked.count() == 0
    assert out.filter(F.col("robust_z") <= 3.0).count() == 0


def test_mad_plan_keeps_fact_unshuffled(spark, sf_dir):
    plan = (
        mad_outliers_events(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_hybrid_rrf_fuses_both_branches(spark, sf_dir):
    """Every fused doc must carry at least one branch rank; the RRF
    score of a doc ranked in BOTH branches beats a doc ranked only in
    one at equal ranks; output caps at HYBRID_TOP_K."""
    from hpv_etl_code_spark.plans.search_queries import (
        HYBRID_TOP_K,
        RRF_K,
        hybrid_rrf_docs,
    )

    out = hybrid_rrf_docs(spark, sf_dir).collect()
    assert 0 < len(out) <= HYBRID_TOP_K
    for r in out:
        assert r.lex_rank is not None or r.vec_rank is not None
        expected = sum(
            1.0 / (RRF_K + rk) for rk in (r.lex_rank, r.vec_rank) if rk is not None
        )
        assert abs(r.rrf_score - round(expected, 6)) < 1e-9


def test_hybrid_rrf_plan_is_scalable(spark, sf_dir):
    """Both candidate branches stay top-k (TakeOrderedAndProject), the
    dense branch broadcasts the single query vector, and the corpus is
    never sort-merge-joined; the whole plan passes the scale lint."""
    from hpv_etl_code_spark.plans.lint import assert_scalable
    from hpv_etl_code_spark.plans.search_queries import hybrid_rrf_docs

    df = hybrid_rrf_docs(spark, sf_dir)
    assert_scalable(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
