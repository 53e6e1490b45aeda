"""Benchmark harness: times headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round 6 — VERDICT r5 #1, matching BASELINE.md's
"median of 3 runs, warm JVM"): each query runs once as a warm-up
(JVM/codegen/scan cache) then SPARK_GRAFT_BENCH_RUNS (default 3) timed
runs via full materialization (executing the entry's OWN physical plan
at the RDD level — ``df.count()`` is NOT full execution: Catalyst
re-optimizes the count and prunes row-preserving subtrees, which
hollowed out 21 entries' timings through round 9; see
plans/profile.py::materialize and ADJUDICATED.md round-9). The recorded per-query figure — and the headline total — is
the MEDIAN of the timed runs; the MIN is emitted alongside in
``queries_min`` as the transition-round legacy field (rounds 3-5
recorded min-of-2, rounds 1-2 a single run; three straight rounds of
sub-second JIT/ambient-drift false regression flags on the min
estimator motivated the switch — see ADJUDICATED.md r5).

The regression guard compares LIKE WITH LIKE: median vs a prior
median-methodology record when one exists at the same sf, else this
run's min vs the prior min-methodology record — a median-vs-min
comparison would flag the systematic min→median shift as a regression.

Round 8 (VERDICT r7 #8): the guard compares against the IMMEDIATELY
PRECEDING round. The driver's BENCH_r{N}.json keeps only a ~2000-char
tail of stdout, so the round-6/7 lines (queries + queries_min + delta ≈
3 KB) were recorded unparsed and the guard silently skipped back to the
last parseable round (r07 compared vs r05). Two fixes: (a) the stdout
line is slimmed to metric/value/queries/delta_vs/regressions — under
the tail cap, so the driver's ledger parses again; (b) every run also
REWRITES its full record (queries_min, per-query delta included) into
the committed ``BENCH_LOG.jsonl`` keyed by (round, sf), and
``_load_prev_round`` reads BOTH sources, picking the latest round
strictly before the current one.

Round 9 (VERDICT r8 #3 — ambient-load robustness): the round-8 driver
run flagged 9 "regressions" that were uniform container-load inflation
on UNTOUCHED code (+9–75% across every query including ones whose plan
files had not changed; the builder's same-commit run matched round 7).
Wall time under a shared, occasionally-loaded host is a PAIRED
measurement problem, so the guard now self-calibrates: the run-wide
``load_index`` — the median of this-run/prev-run ratios across ALL
common queries — estimates the ambient inflation (a REAL regression is
one query moving, which barely shifts a 20+-query median; uniform load
moves them all). The per-query regression threshold scales by the
load_index (capped at 2.0 so a genuine everything-regressed change
cannot fully self-excuse — it still reports, and the cap plus the
``--check`` shuffle-bytes budget, which is load-independent, catch it).
The load_index is emitted in the stdout line and the log record, so a
loaded run self-adjudicates in the driver's ledger.

Round 9 (ADVICE r8): entries whose isolation subprocess failed are now
labeled ``unisolated`` in the record and EXCLUDED from the regression
guard — their fallback figure is a single shared-session probe, not a
median, and comparing it against true medians flagged (or masked)
spurious deltas for exactly the heaviest entries.

``--check`` additionally enforces the SHUFFLE-BYTES budget (VERDICT r8
#8): every headline query is profiled at the committed PROFILE.json's
scale factor and a >2× shuffle_bytes step without an ADJUDICATED.md
entry fails the gate. Shuffle volume is load-independent (unlike wall
time) and is THE scale currency — this is the guard that catches a
plan regression a loaded wall-clock run would hide.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

# deferred: pyspark import is heavy and bench.py --help should be instant
def materialize(df) -> int:
    from hpv_etl_code_spark.plans.profile import materialize as _m
    return _m(df)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_METHODOLOGY = "median-of-3-warm-materialized"


def _n_runs() -> int:
    return max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _steal_sample() -> tuple[int, int] | None:
    """(steal_jiffies, total_jiffies) from /proc/stat, or None off-Linux.
    The round-9 ledger showed whole-run wall inflations on identical
    code with an idle guest; /proc/stat's steal counter is the direct
    evidence of the hypervisor taking the CPU, so each record carries
    the run's steal percentage — a loaded run self-adjudicates with
    KERNEL data rather than only the query-ratio load_index."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _time_one(spark, fn, sf_dir: str) -> tuple[float, float]:
    """Warm-up + SPARK_GRAFT_BENCH_RUNS timed materializations →
    (median, min). The warm-up pays JVM/codegen/scan-cache AND any
    shared-cache artifact build, so timed runs measure the steady
    state."""
    materialize(fn(spark, sf_dir))  # warm-up
    runs: list[float] = []
    for _ in range(_n_runs()):
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 4), round(min(runs), 4)


def _probe_one(spark, fn, sf_dir: str) -> float:
    """Warm-up + ONE timed run — enough to decide whether the entry
    crosses the isolation threshold without paying the full
    median-of-N in a session whose numbers would then be discarded."""
    materialize(fn(spark, sf_dir))  # warm-up
    t0 = time.perf_counter()
    materialize(fn(spark, sf_dir))
    return time.perf_counter() - t0


def _one_entry_main(name: str) -> None:
    """``python bench.py --one <entry>`` — time one headline entry in a
    FRESH session and print one JSON line. Child process of the
    isolation pass (VERDICT r7 #4)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name=f"bench_iso_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = catalog.headline_queries()[name]
    med, mn = _time_one(spark, fn, sf_dir)
    print(json.dumps({"median": med, "min": mn}))
    spark.stop()


def _isolated_timing(name: str, sf_dir: str) -> tuple[float, float] | None:
    """Re-time one entry in a subprocess session. Returns None on any
    child failure (the in-session figure then stands)."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            env=env,
            capture_output=True,
            text=True,
            timeout=int(os.environ.get("SPARK_GRAFT_BENCH_ISO_TIMEOUT", "1800")),
        )
        doc = json.loads(out.stdout.strip().splitlines()[-1])
        return float(doc["median"]), float(doc["min"])
    except Exception as exc:  # noqa: BLE001 — isolation is best-effort
        print(f"bench: isolation of {name} failed: {exc}", file=sys.stderr)
        return None


# Entries slower than this re-run in their own subprocess session
# (VERDICT r7 #4): in the shared session, accumulated persists from
# EARLIER entries evict this entry's shared-cache artifacts mid-run —
# ADJUDICATED.md measured the sf1 dedup_minhash_lsh median at 27.2 s in
# sequence vs 12-13 s isolated on identical code. Isolating the >1 s
# entries makes the MEDIAN trustworthy (its warm-up rebuilds the cache,
# its timed runs share the JVM with nothing). Disable with
# SPARK_GRAFT_BENCH_ISOLATE=0 (the isolated child itself runs with it
# off implicitly — --one mode never recurses).
_ISOLATE_THRESHOLD_SEC = 1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    isolate = os.environ.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0"
    # Round 9: isolation is decided from the COMMITTED prior record when
    # one exists, not from the live probe alone. A slow session used to
    # flip sub-second-class entries over the 1 s probe threshold and
    # re-time them in a fresh JVM, whose one-warm-up median reports
    # JIT-cold numbers — an "isolation storm" that turned a noisy run
    # into a 2× slower-LOOKING one (two same-code round-9 runs recorded
    # 23.5 s vs 43.2 s; the slow one had isolated pricing_summary).
    # With history, an entry's methodology is a function of its
    # committed time class, identical across same-code runs; the probe
    # decides only for entries with no prior record. The class is the
    # entry's MINIMUM across all committed records at this sf — the
    # best-known time is robust to inflated records (the latest record
    # may itself be a storm run, which would make the storm sticky).
    # Entries ISOLATED in a committed prior-round record stay isolated
    # regardless of their min (methodology stickiness — comparing an
    # in-session median against a prior isolated median re-creates the
    # cache-eviction false regressions VERDICT r7 #4 removed).
    prev_iso_q: dict[str, float] = {}
    sticky_iso: set[str] = set()
    _repo_dir = os.path.dirname(os.path.abspath(__file__))
    for _rnd, _rn, _qs, _im in _candidate_records(_repo_dir, sf):
        for _q, _t in _qs.items():
            if _t and _t > 0:
                prev_iso_q[_q] = min(prev_iso_q.get(_q, float("inf")), _t)
    try:
        with open(os.path.join(_repo_dir, "BENCH_LOG.jsonl")) as _fh:
            for _ln in _fh:
                _rec = json.loads(_ln)
                if _rec.get("sf") == sf and _rec.get("round") != _this_round(_repo_dir):
                    sticky_iso.update(_rec.get("isolated") or [])
    except OSError:
        pass
    steal0 = _steal_sample()
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    pending_iso: list[str] = []
    for name, fn in catalog.headline_queries().items():
        try:
            # SPARK_GRAFT_BENCH_RUNS: timed-run count (default 3,
            # median recorded). The sf1 rehearsal uses 1 — its heavy
            # entries run minutes each, and the scaling exponents it
            # measures tolerate noise the per-round sf0.1 guard cannot.
            # Isolation candidates are DECIDED on the committed prior
            # record (fallback: a single probe run) — their in-session
            # numbers would be discarded anyway, so the median-of-N
            # executions happen only in the subprocess.
            if isolate:
                if name in prev_iso_q and prev_iso_q[name] > 0:
                    if prev_iso_q[name] > _ISOLATE_THRESHOLD_SEC or name in sticky_iso:
                        timings[name] = -1.0  # replaced by the subprocess figure
                        timings_min[name] = -1.0
                        pending_iso.append(name)
                        continue
                    timings[name], timings_min[name] = _time_one(spark, fn, sf_dir)
                    continue
                probe = _probe_one(spark, fn, sf_dir)
                if probe > _ISOLATE_THRESHOLD_SEC:
                    timings[name] = round(probe, 4)  # fallback figure
                    timings_min[name] = round(probe, 4)
                    pending_iso.append(name)
                    continue
                t0 = time.perf_counter()
                runs = [probe]
                for _ in range(_n_runs() - 1):
                    t0 = time.perf_counter()
                    materialize(fn(spark, sf_dir))
                    runs.append(time.perf_counter() - t0)
                timings[name] = round(statistics.median(runs), 4)
                timings_min[name] = round(min(runs), 4)
            else:
                timings[name], timings_min[name] = _time_one(spark, fn, sf_dir)
        except Exception as exc:  # noqa: BLE001 — one bad query must not kill the line
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
            timings_min[name] = -1.0

    # Round 9 (measurement fix, second pass): STOP the shared session
    # before the isolation subprocesses run. The parent JVM — 8 g heap,
    # 32 executor threads, every in-session entry's cached artifacts —
    # sits idle but resident while each child times its runs, and that
    # alone inflated child medians up to ~2× (measured:
    # quality_classifier_train 2.16 s median standalone vs 3.93 s with
    # a parent session holding the dedup caches; the round-9 ledger's
    # 5–30 s outliers for isolated entries were this artifact, worst
    # under residual box load). The parent only needs Spark for the
    # in-session loop; the record write below is pure Python. A child
    # failure now re-times in a FRESH session (same isolation property)
    # instead of the old shared-session fallback.
    spark.stop()
    isolated: list[str] = []
    unisolated: list[str] = []
    for name in pending_iso:
        iso = _isolated_timing(name, sf_dir)
        if iso:
            timings[name], timings_min[name] = iso
            isolated.append(name)
        else:
            # fallback: the advertised methodology is an isolated
            # median, so retry in a fresh in-process session; if even
            # that fails, record -1 and label unisolated (ADVICE r8 —
            # fallback figures stay out of the regression guard).
            if timings.get(name, -1.0) < 0:
                try:
                    fresh = get_spark(app_name=f"bench_fallback_{name}")
                    fresh.sparkContext.setLogLevel("ERROR")
                    timings[name], timings_min[name] = _time_one(
                        fresh, catalog.headline_queries()[name], sf_dir
                    )
                    fresh.stop()
                except Exception as exc:  # noqa: BLE001
                    print(f"bench: {name} fallback failed: {exc}", file=sys.stderr)
                    timings[name] = timings_min[name] = -1.0
            unisolated.append(name)

    total = round(sum(timings.values()), 4)
    # stdout line stays SLIM (VERDICT r7 #8): the driver records only a
    # ~2 KB tail, and an unparseable line silently breaks the
    # round-over-round guard chain. Full detail goes to BENCH_LOG.jsonl.
    line = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "methodology": _METHODOLOGY,
        "sf": sf,
    }
    steal1 = _steal_sample()
    record = dict(line)
    if steal0 and steal1 and steal1[1] > steal0[1]:
        steal_pct = round(
            100.0 * (steal1[0] - steal0[0]) / (steal1[1] - steal0[1]), 2
        )
        line["steal_pct"] = steal_pct
        record["steal_pct"] = steal_pct
    record["queries_min"] = timings_min
    record["isolated"] = isolated
    record["unisolated"] = unisolated
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev = _load_prev_round(repo_dir, sf)
    violations: list[str] = []
    if prev:
        prev_name, prev_q, prev_is_median = prev
        ours = timings if prev_is_median else timings_min
        line["delta_vs"] = prev_name
        line["delta_estimator"] = "median" if prev_is_median else "min"
        record["delta_vs"] = prev_name
        record["delta_estimator"] = line["delta_estimator"]
        record["delta"] = {
            q: round(t - prev_q[q], 4)
            for q, t in ours.items()
            if q in prev_q and t >= 0 and prev_q[q] >= 0
        }
        load_index = _load_index(ours, prev_q)
        line["load_index"] = load_index
        record["load_index"] = load_index
        violations = regression_violations(
            ours,
            prev_q,
            _adjudicated_text(repo_dir),
            load_index=load_index,
            exclude=set(unisolated),
        )
        if violations:
            line["regressions"] = violations
            record["regressions"] = violations
            for v in violations:
                print(f"bench: REGRESSION {v}", file=sys.stderr)
    _write_self_record(repo_dir, record)
    print(json.dumps(line))
    spark.stop()
    shuffle_viol: list[str] = []
    if "--check" in sys.argv:
        shuffle_viol = shuffle_budget_violations(repo_dir)
        for v in shuffle_viol:
            print(f"bench: SHUFFLE BUDGET {v}", file=sys.stderr)
    if (violations or shuffle_viol) and "--check" in sys.argv:
        sys.exit(1)


# regression budget: a shared query may not slow >25% round-over-round
# (with a 0.15 s absolute floor so sub-second noise doesn't trip it)
# unless ADJUDICATED.md names it with a rationale — catches the next
# range_join_events-style drift at commit time (`python bench.py
# --check` in the local gate), not at judging
_REGRESSION_RATIO = 1.25
_REGRESSION_FLOOR_SEC = 0.15


# Self-calibration bounds (round 9): the load_index only ever RELAXES
# the guard (≥ 1.0 — a faster-than-before run must not tighten it into
# flagging noise) and is capped at 2.0 (an everything-slowed code change
# cannot fully self-excuse).
_LOAD_INDEX_CAP = 2.0
_LOAD_INDEX_MIN_QUERIES = 5


def _load_index(timings: dict[str, float], prev_q: dict[str, float]) -> float:
    """Run-wide ambient-load estimate: the median of this-run/prev-run
    wall ratios over all common queries. A single genuine regression
    barely moves a 20+-query median; uniform container load moves every
    ratio together — which is exactly the round-8 false-flag class."""
    ratios = sorted(
        t / prev_q[q]
        for q, t in timings.items()
        if q in prev_q and t > 0 and prev_q[q] > 0
    )
    if len(ratios) < _LOAD_INDEX_MIN_QUERIES:
        return 1.0
    return round(
        min(max(1.0, statistics.median(ratios)), _LOAD_INDEX_CAP), 4
    )


def regression_violations(
    timings: dict[str, float],
    prev_q: dict[str, float],
    adjudicated_text: str,
    load_index: float = 1.0,
    exclude: set[str] | None = None,
) -> list[str]:
    out = []
    waived = _adjudicated_names(adjudicated_text)
    for q, t in timings.items():
        p = prev_q.get(q, -1.0)
        if p <= 0 or t < 0:
            continue
        if exclude and q in exclude:
            continue
        budget = p * _REGRESSION_RATIO * max(load_index, 1.0)
        if t > budget and t - p > _REGRESSION_FLOOR_SEC:
            if q in waived:
                continue
            out.append(
                f"{q}: {p:.3f}s -> {t:.3f}s (+{(t / p - 1) * 100:.0f}%"
                f", load_index {load_index:.2f})"
            )
    return out


# shuffle-bytes budget (VERDICT r8 #8): >2× growth per query at the
# committed PROFILE.json's scale factor fails --check unless the query
# is adjudicated. The 1 MiB absolute floor keeps AQE/compression jitter
# on small exchanges from tripping it.
_SHUFFLE_RATIO = 2.0
_SHUFFLE_FLOOR_BYTES = 1 << 20


def shuffle_budget_violations(repo_dir: str) -> list[str]:
    """Profile every headline query at the committed PROFILE.json's
    sf_dir and compare shuffle_bytes against the committed record —
    the LOAD-INDEPENDENT complement to the wall-time guard (shuffle
    volume doesn't care how busy the host is). On a clean pass the
    fresh numbers REPLACE PROFILE.json (the record tracks the code);
    on a violation the old record is kept so the step stays visible
    until fixed or adjudicated in ADJUDICATED.md."""
    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.plans.profile import execute_and_profile
    from hpv_etl_code_spark.session import get_spark

    path = os.path.join(repo_dir, "PROFILE.json")
    try:
        with open(path) as f:
            committed = json.load(f)
    except (OSError, ValueError):
        committed = None
    sf_dir = (committed or {}).get("sf_dir", "/root/testdata/sf0.01")
    old_q = (committed or {}).get("queries", {})

    spark = get_spark(app_name="bench_shuffle_check")
    spark.sparkContext.setLogLevel("ERROR")
    fresh: dict[str, dict] = {}
    for name, fn in catalog.headline_queries().items():
        try:
            fresh[name] = execute_and_profile(fn(spark, sf_dir)).as_dict()
        except Exception as exc:  # noqa: BLE001 — report, don't crash the gate
            print(f"bench: shuffle check {name} failed: {exc}", file=sys.stderr)
    spark.stop()

    waived = _adjudicated_names(_adjudicated_text(repo_dir))
    out: list[str] = []
    for name, prof in fresh.items():
        old = old_q.get(name, {}).get("shuffle_bytes")
        if old is None or name in waived:
            continue
        new = prof.get("shuffle_bytes", 0)
        if new - old > _SHUFFLE_FLOOR_BYTES and new > max(old, 1) * _SHUFFLE_RATIO:
            out.append(
                f"{name}: shuffle {old:,}B -> {new:,}B "
                f"(x{new / max(old, 1):.1f})"
            )
    if not out and fresh:
        with open(path, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": fresh}, f, indent=1)
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


def _this_round(repo_dir: str) -> int:
    """The current driver round (max CORRECTNESS_r{N}.json + 1) — the
    round the in-flight bench run belongs to. Self-log records of THIS
    round are this same session's earlier runs and must not serve as
    the regression baseline (a run would compare against itself)."""
    import glob
    import re as _re

    ns = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))
        if (m := _re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(ns) + 1 if ns else 0


def _write_self_record(repo_dir: str, record: dict) -> None:
    """Rewrite ``BENCH_LOG.jsonl`` with this run's FULL record replacing
    any earlier record of the same (round, sf) — one authoritative line
    per round per scale factor, committed, immune to the driver's
    stdout-tail truncation (VERDICT r7 #8)."""
    path = os.path.join(repo_dir, "BENCH_LOG.jsonl")
    rec = dict(record)
    rec["round"] = _this_round(repo_dir)
    kept: list[dict] = []
    try:
        with open(path) as f:
            for ln in f:
                try:
                    old = json.loads(ln)
                except ValueError:
                    continue
                if (old.get("round"), old.get("sf")) != (rec["round"], rec["sf"]):
                    kept.append(old)
    except OSError:
        pass
    kept.append(rec)
    kept.sort(key=lambda r: (r.get("round", -1), r.get("sf", -1)))
    # atomic replace: a crash mid-write must never truncate the
    # committed guard-chain file (concurrent same-(round,sf) writers
    # are last-wins, which is the dedupe semantic anyway)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, path)


def _candidate_records(repo_dir: str, sf: float):
    """(round, source_name, queries, is_median) for every parseable
    record at this sf — driver BENCH_r{N}.json files (round from the
    filename) plus the self-maintained BENCH_LOG.jsonl (explicit round
    field). Records of the current round are excluded — the baseline
    must be a PRIOR round."""
    import glob
    import re as _re

    this_round = _this_round(repo_dir)
    out = []
    for path in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        m = _re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
            parsed = doc.get("parsed") or doc
            if parsed.get("sf") == sf and parsed.get("queries"):
                out.append(
                    (
                        int(m.group(1)),
                        os.path.basename(path),
                        parsed["queries"],
                        parsed.get("methodology") == _METHODOLOGY,
                    )
                )
        except Exception:  # noqa: BLE001 — a malformed record is not fatal
            continue
    try:
        with open(os.path.join(repo_dir, "BENCH_LOG.jsonl")) as f:
            for ln in f:
                try:
                    rec = json.loads(ln)
                except ValueError:
                    continue
                if rec.get("sf") == sf and rec.get("queries") and "round" in rec:
                    out.append(
                        (
                            int(rec["round"]),
                            f"BENCH_LOG.jsonl:r{rec['round']}",
                            rec["queries"],
                            rec.get("methodology") == _METHODOLOGY,
                        )
                    )
    except OSError:
        pass
    return [r for r in out if this_round <= 0 or r[0] < this_round]


def _load_prev_round(repo_dir: str, sf: float):
    """The IMMEDIATELY PRECEDING round's record at the same scale
    factor → (name, queries, is_median). Among all parseable prior
    records (driver files + self log), the latest MEDIAN-methodology
    record wins (like-for-like comparison; driver file preferred over
    the self log at the same round); with only legacy min records, the
    latest of those is returned with is_median=False so the caller
    compares mins."""
    cands = _candidate_records(repo_dir, sf)
    if not cands:
        return None
    # sort: round ASC, driver-file-after-selflog so that ties on round
    # resolve to the driver's official record (it sorts later and wins
    # the "latest" scan below)
    cands.sort(key=lambda r: (r[0], not r[1].startswith("BENCH_LOG")))
    latest_median = None
    latest_any = None
    for rnd, name, queries, is_median in cands:
        latest_any = (name, queries, False)
        if is_median:
            latest_median = (name, queries, True)
    return latest_median or latest_any


if __name__ == "__main__":
    if "--one" in sys.argv:
        _one_entry_main(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
