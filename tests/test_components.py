"""Connected-components operator: differential tests against a Python
union-find on crafted and fuzzed graphs, convergence-rate checks (the
pointer-jumping claim), and the composed dedup-grouping invariants."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hpv_etl_code_spark.operators.components import (
    connected_components,
    dedup_component_keepers,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    roots = {}
    for v in list(parent):
        roots[v] = find(v)
    return {v: min(u for u in roots if roots[u] == r) for v, r in roots.items()}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r.id: r.component for r in out.collect()}


def test_chain_collapses_to_min(spark):
    n = 64
    got = _run(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_two_components_and_self_loop(spark):
    edges = [(5, 3), (3, 9), (20, 21), (21, 21)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    edges = [(1, 2), (2, 1), (1, 2), (2, 3)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_chain_converges_logarithmically(spark):
    """A 64-link chain must converge well under 64 rounds — pointer
    jumping is the difference between O(diameter) and O(log diameter);
    plain propagation would exhaust max_iter=10 here."""
    got = _run(spark, [(i, i + 1) for i in range(64)], max_iter=10)
    assert got[64] == 0


def test_unconverged_raises(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _run(spark, [(i, i + 1) for i in range(64)], max_iter=2)


edge_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_st)
def test_matches_union_find(spark_session_holder, edges):
    got = _run(spark_session_holder, [(a, b) for a, b in edges])
    assert got == _union_find(edges)


def test_keepers_partition_the_edge_nodes(spark):
    edges = [(1, 2), (2, 3), (10, 11), (30, 31), (31, 32), (32, 30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    keep = {r.component: r.n_members for r in dedup_component_keepers(df).collect()}
    assert keep == {1: 3, 10: 2, 30: 3}


def test_pagerank_star_graph_semantics(spark):
    """Hub of a star graph accumulates rank; leaves tie; ranks are
    deterministic across runs; total mass ≤ 1 (dangling leak only)."""
    from hpv_etl_code_spark.operators.components import pagerank

    # 5 leaves all pointing at node 0; 0 points back at 1
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], ["src", "dst"]
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert max(out, key=out.get) == 0
    leaf_ranks = {round(out[i], 12) for i in range(2, 6)}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
    assert out[1] > out[2]  # 1 gets the hub's entire out-rank
    # contributions quantize at 8 decimals (dsum) — mass can exceed 1 by
    # ~iterations × n_edges × 5e-9
    assert sum(out.values()) <= 1.0 + 1e-6
    again = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert again == out
