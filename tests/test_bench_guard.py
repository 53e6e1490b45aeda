"""The bench regression budget: >25% round-over-round slowdowns on a
shared headline query fail the local gate unless ADJUDICATED.md names
the query with a rationale."""

from __future__ import annotations

from bench import regression_violations


def test_regression_over_budget_flagged():
    got = regression_violations({"q": 1.0}, {"q": 0.5}, "")
    assert len(got) == 1 and got[0].startswith("q:")


def test_small_absolute_drift_ignored():
    # 2× but only +0.08 s — under the 0.15 s absolute floor
    assert regression_violations({"q": 0.16}, {"q": 0.08}, "") == []


def test_within_budget_ok():
    assert regression_violations({"q": 0.6}, {"q": 0.5}, "") == []


def test_adjudicated_note_excuses():
    note = "## q\nOutput grew 3x by design this round."
    assert regression_violations({"q": 1.0}, {"q": 0.5}, note) == []


def test_new_and_failed_queries_skipped():
    got = regression_violations(
        {"new_q": 9.0, "failed": -1.0}, {"failed": 1.0}, ""
    )
    assert got == []


def test_prev_round_prefers_median_methodology_record(tmp_path):
    """VERDICT r5 #1: the guard compares like with like — a
    median-of-3 record at the same sf wins over a newer legacy min
    record; with only legacy records it returns is_median=False so the
    caller compares mins (median-vs-min would flag the systematic
    estimator shift as a regression)."""
    import json

    from bench import _METHODOLOGY, _load_prev_round

    legacy = {"sf": 0.1, "queries": {"q": 1.0}}
    (tmp_path / "BENCH_r05.json").write_text(json.dumps(legacy))
    name, q, is_median = _load_prev_round(str(tmp_path), 0.1)
    assert (name, is_median) == ("BENCH_r05.json", False) and q == {"q": 1.0}

    med = {"sf": 0.1, "queries": {"q": 1.2}, "methodology": _METHODOLOGY}
    (tmp_path / "BENCH_r06.json").write_text(json.dumps(med))
    name, q, is_median = _load_prev_round(str(tmp_path), 0.1)
    assert (name, is_median) == ("BENCH_r06.json", True) and q == {"q": 1.2}

    # a LATER legacy record does not displace the median one
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(legacy))
    name, q, is_median = _load_prev_round(str(tmp_path), 0.1)
    assert (name, is_median) == ("BENCH_r06.json", True)

    # other-sf records are ignored entirely
    assert _load_prev_round(str(tmp_path), 1.0) is None


def test_adjudication_requires_section_header():
    """A passing mention of a query inside ANOTHER query's rationale must
    not waive its regression — only a '## <name>' header counts."""
    note = "## other_query\nThis regressed because dedup_minhash_lsh grew.\n"
    got = regression_violations({"dedup_minhash_lsh": 1.0}, {"dedup_minhash_lsh": 0.5}, note)
    assert len(got) == 1
    # header form (incl. slash-joined lists) does excuse
    hdr = "## a / dedup_minhash_lsh\nrationale\n"
    assert regression_violations(
        {"dedup_minhash_lsh": 1.0}, {"dedup_minhash_lsh": 0.5}, hdr
    ) == []
