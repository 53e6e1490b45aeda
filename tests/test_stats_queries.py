"""Invariant tests for plans/stats_queries.py beyond the generic oracle
mirror: HLL error envelope + mergeability, purged-CV partition
completeness and embargo geometry, PMI algebraic identities, Benford
share normalization."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hpv_etl_code_spark.plans import stats_queries
from hpv_etl_code_spark.sources.registry import load_table


def test_hll_portable_error_envelope(spark, sf_dir):
    """HLL(p=8) relative standard error is 1.04/sqrt(256) = 6.5%;
    allow 4 sigma per group against the exact distinct rider."""
    rows = stats_queries.hll_distinct_portable(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_registers_hit <= 256
        assert abs(r.hll_estimate - r.n_exact) <= max(0.26 * r.n_exact, 4), r


def test_hll_register_state_is_mergeable(spark, sf_dir):
    """max(rho) per register over any partition of the input composes
    by max — split the events stream in two, merge register states,
    and the merged sketch must equal the single-pass sketch."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    regs = ev.select(
        (F.col("event_id") % 2).alias("half"), h.alias("h")
    ).select(
        "half",
        (F.col("h") % 256).alias("reg"),
        F.expr("shiftright(h, 8)").alias("w"),
    ).select(
        "half",
        "reg",
        F.when(F.col("w") == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin("w")))
        .alias("rho"),
    )
    single = {
        (r.reg): r.m
        for r in regs.groupBy("reg").agg(F.max("rho").alias("m")).collect()
    }
    halves = (
        regs.groupBy("half", "reg").agg(F.max("rho").alias("m"))
        .groupBy("reg")
        .agg(F.max("m").alias("m"))
    )
    merged = {r.reg: r.m for r in halves.collect()}
    assert merged == single


def test_purged_cv_partitions_every_event_exactly_once(spark, sf_dir):
    rows = stats_queries.purged_timeseries_cv(spark, sf_dir).collect()
    assert len(rows) == stats_queries._CV_K
    n_total = load_table(spark, sf_dir, "events").count()
    spans = sorted((r.fold_start, r.fold_end) for r in rows)
    # contiguous, non-overlapping fold grid covering [min, max]
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s1
    for r in rows:
        # every event is exactly one of test/purged/train for each fold
        assert r.n_test + r.n_purged + r.n_train == n_total
        assert r.n_test > 0
        # embargo strictly shrinks the training set vs a naive split
        assert r.n_train < n_total - r.n_test
        assert 0.0 <= r.train_frac <= 1.0


def test_pmi_identities(spark, sf_dir):
    rows = stats_queries.pmi_token_pairs(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    for r in rows:
        assert r.tok_a < r.tok_b  # ordered pairs, no duplicates
        assert r.n_ab <= min(r.n_a, r.n_b) <= n_docs
        expect = math.log(r.n_ab * n_docs / (r.n_a * r.n_b))
        assert abs(r.pmi - expect) < 1e-5
        # NPMI bounded: [-1, 1]
        assert -1.0 - 1e-9 <= r.npmi <= 1.0 + 1e-9


def test_lsh_recall_eval_bounds(spark, sf_dir):
    """Candidate recall must sit near the banding theory value
    (1-(1-J^r)^b ≈ 0.88 at J=0.8, r=4, b=4 — higher on real corpora
    whose similar pairs exceed the threshold); the TP count is bounded
    by both sides."""
    r = stats_queries.lsh_recall_eval(spark, sf_dir).collect()[0]
    assert r.n_tp <= min(r.n_truth, r.n_candidates)
    if r.n_truth:
        assert 0.5 <= r.recall <= 1.0
    if r.n_candidates:
        assert 0.0 <= r.precision <= 1.0


def test_ks_statistic_matches_reference(spark, sf_dir):
    """Exact KS D per type must equal a direct numpy computation of
    sup|F1 - F2| on the same midpoint split."""
    import numpy as np

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value", F.unix_timestamp("ts").alias("at"))
        .collect()
    )
    mid = (min(r.at for r in ev) + max(r.at for r in ev)) // 2
    got = {r.event_type: r for r in stats_queries.ks_test_drift(spark, sf_dir).collect()}
    for et in {r.event_type for r in ev}:
        a = np.sort([r.value for r in ev if r.event_type == et and r.at < mid])
        b = np.sort([r.value for r in ev if r.event_type == et and r.at >= mid])
        grid = np.union1d(a, b)
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        d = np.max(np.abs(fa - fb))
        r = got[et]
        assert (r.n_early, r.n_late) == (len(a), len(b))
        assert abs(r.ks_d - d) < 1e-6, (et, r.ks_d, d)


def test_zonemap_zorder_prunes_at_least_as_well(spark, sf_dir):
    rows = {r.layout: r for r in stats_queries.zonemap_prune_stats(spark, sf_dir).collect()}
    assert set(rows) == {"natural", "zorder"}
    nat, zo = rows["natural"], rows["zorder"]
    # same table, same file sizing → identical totals
    assert nat.n_rows == zo.n_rows
    assert nat.n_rows_matching == zo.n_rows_matching
    # zone maps never skip a file containing a match
    for r in rows.values():
        assert r.n_rows_scanned >= r.n_rows_matching
        assert r.n_files_read <= r.n_files
    # the whole point: clustering by the predicate dims reads no more
    assert zo.n_files_read <= nat.n_files_read


def test_hll_sliding_tracks_exact_window_distinct(spark, sf_dir):
    """The merged 7-day register estimate must sit inside the HLL
    error envelope of the exact trailing-window distinct count,
    computed driver-side."""
    import collections

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("di"),
            "user_id",
        )
        .collect()
    )
    by_day = collections.defaultdict(set)
    for r in ev:
        by_day[r.di].add(r.user_id)
    got = {r.di: r.hll_7d_estimate for r in stats_queries.hll_sliding_distinct(spark, sf_dir).collect()}
    assert set(got) == set(by_day)
    for di, est in got.items():
        exact = len(set().union(*(by_day.get(d, set()) for d in range(di - 6, di + 1))))
        assert abs(est - exact) <= max(0.26 * exact, 4), (di, est, exact)


def test_target_encoding_loo_excludes_own_row(spark, sf_dir):
    """For any category, sum of (loo_enc * (n-1)) + own value must
    reconstruct the category total; and a row's encoding must differ
    from the plain category mean whenever its value differs from it."""
    import collections

    rows = stats_queries.target_encoding_loo(spark, sf_dir).collect()
    c = {
        r.c_custkey: r.c_acctbal
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    by_seg = collections.defaultdict(list)
    for r in rows:
        by_seg[r.c_mktsegment].append(r)
    for seg, rs in by_seg.items():
        total = sum(c[r.c_custkey] for r in rs)
        n = len(rs)
        assert all(r.n_seg == n for r in rs)
        for r in rs[:50]:
            expect = (total - c[r.c_custkey]) / (n - 1)
            assert abs(r.loo_enc - expect) < 1e-4, (seg, r.c_custkey)


def test_bfs_hops_min_distance(spark, sf_dir):
    """BFS histogram must match a driver-side reference BFS on the
    collected edge list."""
    from hpv_etl_code_spark.plans import temporal_graph_queries as tg

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    import collections

    orders = collections.defaultdict(set)
    for r in li:
        orders[r.l_orderkey].add(r.l_partkey)
    adj = collections.defaultdict(set)
    for parts in orders.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)
    seed = min(
        r.p_partkey for r in load_table(spark, sf_dir, "part").collect()
    )
    dist = {seed: 0}
    frontier = [seed]
    for d in range(1, tg._BFS_MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    expect = collections.Counter(dist.values())
    got = {
        r.dist: r.n_nodes
        for r in tg.bfs_hops_copurchase(spark, sf_dir).collect()
    }
    assert got == dict(expect)


def test_benford_shares_normalize(spark, sf_dir):
    rows = stats_queries.benford_digit_profile(spark, sf_dir).collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    # Benford expectation sums to 1 over the full digit support
    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12
    for r in rows:
        assert r.chisq_term >= 0.0
