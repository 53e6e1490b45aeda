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


def test_load_index_is_median_ratio_clamped():
    """Round 9 (VERDICT r8 #3): uniform ambient inflation is estimated
    by the median this/prev ratio, floored at 1.0 (a fast run must not
    tighten the guard) and capped at 2.0 (an everything-regressed code
    change cannot fully self-excuse)."""
    from bench import _load_index

    prev = {f"q{i}": 1.0 for i in range(6)}
    # uniform +40% load
    now = {f"q{i}": 1.4 for i in range(6)}
    assert _load_index(now, prev) == 1.4
    # faster run: floored to 1.0, never < 1
    assert _load_index({f"q{i}": 0.5 for i in range(6)}, prev) == 1.0
    # 3x everything: capped at 2.0
    assert _load_index({f"q{i}": 3.0 for i in range(6)}, prev) == 2.0
    # too few common queries -> no calibration
    assert _load_index({"q0": 3.0}, prev) == 1.0


def test_load_index_excuses_uniform_inflation_not_outliers():
    """The round-8 false-flag class: +40% on EVERYTHING is ambient load
    (no flags once normalized); one query at +200% while the rest sit
    at +40% is a real regression and still flags."""
    prev = {f"q{i}": 1.0 for i in range(10)}
    uniform = {f"q{i}": 1.4 for i in range(10)}
    from bench import _load_index

    li = _load_index(uniform, prev)
    assert regression_violations(uniform, prev, "", load_index=li) == []
    outlier = dict(uniform, q0=3.0)
    li = _load_index(outlier, prev)
    got = regression_violations(outlier, prev, "", load_index=li)
    assert len(got) == 1 and got[0].startswith("q0:")


def test_unisolated_entries_excluded_from_guard():
    """ADVICE r8: an entry whose isolation subprocess failed carries a
    1-run probe, not a median — it must not be compared against true
    medians."""
    got = regression_violations(
        {"q": 1.0}, {"q": 0.5}, "", exclude={"q"}
    )
    assert got == []


def test_shuffle_budget_math(tmp_path):
    """The shuffle guard flags >2x steps over the 1 MiB floor and
    waives adjudicated queries — exercised through the same helpers
    the runtime path uses (the profiling run itself is covered by
    tests/test_profile.py)."""
    from bench import _SHUFFLE_FLOOR_BYTES, _SHUFFLE_RATIO, _adjudicated_names

    old, new = 2 << 20, 5 << 20  # 2 MiB -> 5 MiB: x2.5 over the floor
    assert new - old > _SHUFFLE_FLOOR_BYTES and new > old * _SHUFFLE_RATIO
    small_old, small_new = 1000, 5000  # x5 but under the absolute floor
    assert not (small_new - small_old > _SHUFFLE_FLOOR_BYTES)
    assert "q" in _adjudicated_names("## q\nshuffle grew by design\n")


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


def test_prev_round_reads_self_log_and_prefers_preceding_round(tmp_path):
    """VERDICT r7 #8: the guard must compare against the immediately
    preceding round even when the driver's BENCH_r{N}.json tail was
    recorded unparseable — bench.py's own BENCH_LOG.jsonl fills the
    gap. A driver file and a self record of the SAME round resolve to
    the driver's official file."""
    import json

    from bench import _METHODOLOGY, _load_prev_round, _write_self_record

    # r5: parseable legacy driver record; r6/r7: unparseable (parsed
    # null + tail only) — the exact round-6/7 failure shape
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.0}})
    )
    for n in ("06", "07"):
        (tmp_path / f"BENCH_r{n}.json").write_text(
            json.dumps({"parsed": None, "tail": "...", "sf": 0.1})
        )
    name, q, is_median = _load_prev_round(str(tmp_path), 0.1)
    assert name == "BENCH_r05.json"

    # the self log carries the parseable round-7 record -> it wins
    (tmp_path / "BENCH_LOG.jsonl").write_text(
        json.dumps(
            {
                "round": 7,
                "sf": 0.1,
                "queries": {"q": 2.0},
                "methodology": _METHODOLOGY,
            }
        )
        + "\n"
    )
    name, q, is_median = _load_prev_round(str(tmp_path), 0.1)
    assert (name, q, is_median) == ("BENCH_LOG.jsonl:r7", {"q": 2.0}, True)

    # same-round driver record (parseable) outranks the self log
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "sf": 0.1,
                    "queries": {"q": 2.1},
                    "methodology": _METHODOLOGY,
                }
            }
        )
    )
    name, q, is_median = _load_prev_round(str(tmp_path), 0.1)
    assert (name, q) == ("BENCH_r07.json", {"q": 2.1})


def test_self_log_excludes_current_round_and_dedupes(tmp_path):
    """A run must never baseline against its own round's earlier runs:
    records with round >= current (derived from CORRECTNESS ledgers)
    are excluded, and _write_self_record keeps one line per
    (round, sf)."""
    import json

    from bench import _METHODOLOGY, _load_prev_round, _write_self_record

    (tmp_path / "CORRECTNESS_r07.json").write_text("{}")  # current = 8
    rec = {"sf": 0.1, "queries": {"q": 3.0}, "methodology": _METHODOLOGY}
    _write_self_record(str(tmp_path), rec)  # lands as round 8
    _write_self_record(str(tmp_path), dict(rec, queries={"q": 3.5}))
    lines = (tmp_path / "BENCH_LOG.jsonl").read_text().splitlines()
    assert len(lines) == 1 and json.loads(lines[0])["queries"] == {"q": 3.5}
    # round-8 self record is invisible to the round-8 guard
    assert _load_prev_round(str(tmp_path), 0.1) is None
