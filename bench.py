"""Benchmark harness: times headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round 6 — VERDICT r5 #1, matching BASELINE.md's
"median of 3 runs, warm JVM"): each query runs once as a warm-up
(JVM/codegen/scan cache) then SPARK_GRAFT_BENCH_RUNS (default 3) timed
runs via full materialization (count of the result, so the whole plan
executes). The recorded per-query figure — and the headline total — is
the MEDIAN of the timed runs; the MIN is emitted alongside in
``queries_min`` as the transition-round legacy field (rounds 3-5
recorded min-of-2, rounds 1-2 a single run; three straight rounds of
sub-second JIT/ambient-drift false regression flags on the min
estimator motivated the switch — see ADJUDICATED.md r5).

The regression guard compares LIKE WITH LIKE: median vs a prior
median-methodology record when one exists at the same sf, else this
run's min vs the prior min-methodology record — a median-vs-min
comparison would flag the systematic min→median shift as a regression.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_METHODOLOGY = "median-of-3-warm"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    for name, fn in catalog.headline_queries().items():
        try:
            fn(spark, sf_dir).count()  # warm-up
            # SPARK_GRAFT_BENCH_RUNS: timed-run count (default 3,
            # median recorded). The sf1 rehearsal uses 1 — its heavy
            # entries run minutes each, and the scaling exponents it
            # measures tolerate noise the per-round sf0.1 guard cannot.
            n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
            runs: list[float] = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 4)
            timings_min[name] = round(min(runs), 4)
        except Exception as exc:  # noqa: BLE001 — one bad query must not kill the line
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
            timings_min[name] = -1.0

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "methodology": _METHODOLOGY,
        "sf": sf,
    }
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev = _load_prev_round(repo_dir, sf)
    violations: list[str] = []
    if prev:
        prev_name, prev_q, prev_is_median = prev
        ours = timings if prev_is_median else timings_min
        line["delta_vs"] = prev_name
        line["delta_estimator"] = "median" if prev_is_median else "min"
        line["delta"] = {
            q: round(t - prev_q[q], 4)
            for q, t in ours.items()
            if q in prev_q and t >= 0 and prev_q[q] >= 0
        }
        violations = regression_violations(
            ours, prev_q, _adjudicated_text(repo_dir)
        )
        if violations:
            line["regressions"] = violations
            for v in violations:
                print(f"bench: REGRESSION {v}", file=sys.stderr)
    print(json.dumps(line))
    spark.stop()
    if violations and "--check" in sys.argv:
        sys.exit(1)


# regression budget: a shared query may not slow >25% round-over-round
# (with a 0.15 s absolute floor so sub-second noise doesn't trip it)
# unless ADJUDICATED.md names it with a rationale — catches the next
# range_join_events-style drift at commit time (`python bench.py
# --check` in the local gate), not at judging
_REGRESSION_RATIO = 1.25
_REGRESSION_FLOOR_SEC = 0.15


def regression_violations(
    timings: dict[str, float],
    prev_q: dict[str, float],
    adjudicated_text: str,
) -> list[str]:
    out = []
    waived = _adjudicated_names(adjudicated_text)
    for q, t in timings.items():
        p = prev_q.get(q, -1.0)
        if p <= 0 or t < 0:
            continue
        if t > p * _REGRESSION_RATIO and t - p > _REGRESSION_FLOOR_SEC:
            if q in waived:
                continue
            out.append(f"{q}: {p:.3f}s -> {t:.3f}s (+{(t / p - 1) * 100:.0f}%)")
    return out


def _adjudicated_names(adjudicated_text: str) -> set[str]:
    """Query names adjudicated via '## <name>' section headers (slash-
    separated lists allowed). Raw substring matching was a hole: one
    entry's rationale mentioning another query's name would silently
    waive that query's regression."""
    names: set[str] = set()
    for line in adjudicated_text.splitlines():
        if line.startswith("## "):
            for part in line[3:].replace(",", "/").split("/"):
                names.add(part.strip())
    return names


def _adjudicated_text(repo_dir: str) -> str:
    try:
        with open(os.path.join(repo_dir, "ADJUDICATED.md")) as f:
            return f.read()
    except OSError:
        return ""


def _load_prev_round(repo_dir: str, sf: float):
    """Latest BENCH_r{N}.json at the same scale factor →
    (name, queries, is_median). Prefers the latest MEDIAN-methodology
    record (like-for-like comparison); falls back to the latest legacy
    min-estimator record, in which case the guard compares this run's
    min against it."""
    import glob

    latest_median = None
    latest_any = None
    for path in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                doc = json.load(f)
            parsed = doc.get("parsed", doc)
            if parsed.get("sf") == sf and parsed.get("queries"):
                rec = (os.path.basename(path), parsed["queries"])
                latest_any = rec + (False,)
                if parsed.get("methodology") == _METHODOLOGY:
                    latest_median = rec + (True,)
        except Exception:  # noqa: BLE001 — a malformed record is not fatal
            continue
    return latest_median or latest_any


if __name__ == "__main__":
    main()
