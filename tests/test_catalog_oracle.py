"""The differential gate, in-repo: every catalog entry with an oracle is
run against DuckDB at sf0.001 (fast) — mirroring what the driver does at
sf0.01. Entries without an oracle are checked for executability + rows.
"""

from __future__ import annotations

import pytest

from hpv_etl_code_spark import catalog
from tests.oracle_util import compare


def _entry_names():
    return sorted(catalog.entries())


@pytest.mark.parametrize("name", _entry_names())
def test_catalog_entry_matches_oracle(spark, sf_dir, name):
    e = catalog.entries()[name]
    df = e.fn(spark, sf_dir)
    if e.oracle is None:
        # rows-only: plan executes and yields a stable, non-erroring result
        assert df.count() >= 0
    else:
        compare(df, e.oracle, sf_dir)


def test_gate_window_composition():
    """The driver checks ~50 entries in registration order; the priority
    window must stay exactly 50, fully registered, in order, and
    oracle-dense (rows-only in-window entries need an inherent reason)."""
    from hpv_etl_code_spark import catalog

    es = catalog.entries()
    names = list(es)
    window = catalog._PRIORITY + catalog._rotation_window()
    assert len(window) == 50
    assert names[:50] == list(window)
    # rotation invariants: halves are disjoint from the pinned core and
    # from each other, so every pooled entry is in-window every other
    # round (ADVICE r3)
    pool = catalog._ROTATION_POOL
    assert len(pool) >= catalog._ROTATION_SLOTS
    assert not set(pool) & set(catalog._PRIORITY)
    assert len(set(pool)) == len(pool)
    assert all(n in es for n in pool)
    # VERDICT r5 #3: the ledger-driven scheduler visits every pool
    # entry within ceil(n/slots) rounds — simulate: each round's slice
    # is recorded as checked, which pushes it to the back of the order
    import math

    last = catalog._ledger_last_checked()
    slots = catalog._ROTATION_SLOTS
    rounds = math.ceil(len(pool) / slots) + 1
    seen = set()
    for r in range(catalog._ROUND, catalog._ROUND + rounds):
        order = sorted(range(len(pool)), key=lambda i: (last.get(pool[i], -1), i))
        sl = [pool[i] for i in order[:slots]]
        seen.update(sl)
        for n in sl:
            last[n] = r
    assert seen == set(pool)
    rows_only = [n for n in names[:50] if es[n].oracle is None]
    # round 3: the window is fully oracle-dense — the sketch slot is
    # held by the portable KMV entry (exact DuckDB twin);
    # approx_sketches (engine-internal HLL/KLL state) lives in the
    # long tail with its error-envelope tests
    assert rows_only == [], rows_only
    # the sketch-family slot is held by the portable entries (exact
    # DuckDB twins — kmv_distinct_portable pinned through round 6, the
    # sketch_battery thereafter); approx_sketches (engine-internal
    # HLL/KLL state, rows-only by design) must never take a window slot
    assert "approx_sketches" in names[50:]


def test_rotation_slice_prefers_never_checked_entries():
    """VERDICT r5 #3 done-criterion: while ANY pool entry has never
    appeared in a CORRECTNESS_r*.json ledger, the current round's slice
    must contain ONLY such entries (least-recently-checked ordering
    degrades gracefully once the pool has full first-check coverage)."""
    pool = catalog._ROTATION_POOL
    last = catalog._ledger_last_checked()
    never = [n for n in pool if last.get(n, -1) < 0]
    window = catalog._rotation_window()
    assert len(window) == catalog._ROTATION_SLOTS
    if len(never) >= catalog._ROTATION_SLOTS:
        assert all(n in never for n in window), (window, never[:10])
        # and specifically the FIRST never-checked entries in pool order
        assert list(window) == never[: catalog._ROTATION_SLOTS]


def test_rotation_pool_entries_stay_oracle_backed():
    """VERDICT r4 #8: a pool entry that silently lost its oracle would
    previously only surface in the round it rotated into the window.
    Guard: every rotation-pool entry must carry an oracle at
    registration time (the sf0.001 mirror above then hash-checks it
    every test run), and the pool must cover the ENTIRE oracle-green
    tail — nothing oracle-backed is permanently out of driver reach."""
    es = catalog.entries()
    pool = catalog._ROTATION_POOL
    missing_oracle = [n for n in pool if es[n].oracle is None]
    assert missing_oracle == [], missing_oracle
    tail_green = {
        n for n, e in es.items()
        if e.oracle is not None and n not in catalog._PRIORITY
    }
    assert set(pool) == tail_green, (
        set(pool) ^ tail_green
    )


def test_components_gate_params_match_runtime_derivation(spark, sf_dir):
    """Round 8 (VERDICT r7 #1): dedup_components_portable (and, round
    9, dedup_shingles_scaled) band with runtime corpus-sized parameters
    while their DuckDB twins pin the sf0.01-decade values
    (_GATE_NH/_GATE_BANDS). Those must be the SAME
    numbers at gate scale, or the differential compare silently checks
    two different banding regimes. Decade rounding makes the pin stable
    for 11..1000 documents; this asserts the actual test corpus is
    inside that window."""
    from hpv_etl_code_spark.plans.shared_cache import corpus_lsh_params
    from hpv_etl_code_spark.plans.text_queries import _GATE_BANDS, _GATE_NH

    assert corpus_lsh_params(spark, sf_dir) == (_GATE_NH, _GATE_BANDS)


def test_ann_gate_params_match_runtime_derivation(spark, sf_dir):
    """Round 8 (VERDICT r7 #3): embedding_neardup_scaled buckets with
    runtime corpus-sized hyperplane parameters while its DuckDB twin
    embeds the gate-scale decade values as plane literals. Same-number
    assertion as the components pin."""
    from hpv_etl_code_spark.operators.similarity import scaled_ann_params
    from hpv_etl_code_spark.plans.vector_queries import (
        _ANN_GATE_NBITS,
        _ANN_GATE_NTABLES,
    )
    from hpv_etl_code_spark.sources.registry import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert scaled_ann_params(n) == (_ANN_GATE_NBITS, _ANN_GATE_NTABLES)
