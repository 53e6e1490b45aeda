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
