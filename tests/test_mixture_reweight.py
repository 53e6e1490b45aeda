"""mixture_reweight_rounds (VERDICT r6 #5): bounded multiplicative
reweighting toward the uniform token share under a downsample-only
clamp. Pins convergence direction and the clamp/exactness invariants;
value-level correctness is the DuckDB oracle's job (catalog mirror)."""

from __future__ import annotations

from collections import defaultdict

from hpv_etl_code_spark import catalog


def _rows(spark, sf_dir):
    return catalog.entries()["mixture_reweight_rounds"].fn(
        spark, sf_dir
    ).collect()


def test_share_gap_monotone_toward_target(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    by_round = defaultdict(list)
    for r in rows:
        by_round[r.round].append(r)
    rounds = sorted(by_round)
    assert rounds == [1, 2, 3, 4]
    # Σ|share − target| never increases (integer-permille rounding can
    # leave it flat at equilibrium, never push it back up materially)
    gaps = [sum(x.abs_gap for x in by_round[k]) for k in rounds]
    for a, b in zip(gaps, gaps[1:]):
        assert b <= a + 1e-6, gaps
    # the most over-represented source's share shrinks monotonically
    maxes = [max(x.eff_share for x in by_round[k]) for k in rounds]
    for a, b in zip(maxes, maxes[1:]):
        assert b <= a + 1e-9, maxes


def test_rates_stay_clamped_and_chained(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    nxt = {}
    for r in sorted(rows, key=lambda x: (x.round, x.source)):
        assert 1 <= r.rate_permille <= 1000
        assert 1 <= r.new_rate_permille <= 1000
        if r.round == 1:
            assert r.rate_permille == 1000  # keep-everything start
        else:
            assert r.rate_permille == nxt[r.source], r.source
        nxt[r.source] = r.new_rate_permille
    # downsample-only: once a source is cut below 1000 it can rise again
    # only toward (and never above) the clamp — implied by the bounds
    # asserted above; the waterfilling equilibrium itself is pinned by
    # the oracle hash.


def test_shares_sum_to_one_each_round(spark, sf_dir):
    rows = _rows(spark, sf_dir)
    by_round = defaultdict(float)
    for r in rows:
        by_round[r.round] += r.eff_share
    for k, s in by_round.items():
        assert abs(s - 1.0) < 1e-4, (k, s)
