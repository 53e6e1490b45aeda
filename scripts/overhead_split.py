"""Fixed-overhead split per headline entry (optimization round 10,
VERDICT r9 #2): the scaling block showed 16 of 26 headliners with
8-vs-32-core ratios ≈ 1 — their sf0.1 wall is fixed per-job cost, not
compute. This script measures WHERE that fixed cost lives, per entry:

- ``t_fn``    — Python DSL build: ``fn(spark, sf_dir)`` → DataFrame
                (py4j expression construction + analysis triggers)
- ``t_plan``  — driver planning: ``executedPlan()`` (analysis +
                optimization + physical planning + initial AQE plan)
- ``t_exec``  — execution: ``executedPlan().execute().count()`` (the
                bench's honest-materialization action), which includes
                AQE re-planning and per-stage job scheduling

All three are medians of N warm repetitions after one warm-up (the
bench methodology). Usage::

    python scripts/overhead_split.py [sf_dir] [entry ...]

Writes OVERHEAD_SPLIT.json at the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="overhead_split")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name, fn in catalog.headline_queries().items():
        if only and name not in only:
            continue
        try:
            # warm-up run (JVM, codegen, shared-cache artifacts)
            df = fn(spark, sf_dir)
            df._jdf.queryExecution().executedPlan().execute().count()
            t_fn, t_plan, t_exec = [], [], []
            for _ in range(N):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                plan = df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                plan.execute().count()
                t3 = time.perf_counter()
                t_fn.append(t1 - t0)
                t_plan.append(t2 - t1)
                t_exec.append(t3 - t2)
            rec = {
                "fn": round(statistics.median(t_fn), 4),
                "plan": round(statistics.median(t_plan), 4),
                "exec": round(statistics.median(t_exec), 4),
            }
            rec["total"] = round(rec["fn"] + rec["plan"] + rec["exec"], 4)
            out[name] = rec
            print(
                f"{name:32s} fn={rec['fn']:7.3f} plan={rec['plan']:7.3f} "
                f"exec={rec['exec']:7.3f} total={rec['total']:7.3f}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — keep the sweep alive
            print(f"{name}: FAILED {exc}", flush=True)
            out[name] = {"error": str(exc)}

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "OVERHEAD_SPLIT.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "n_runs": N, "queries": out}, f, indent=1)
    print("wrote OVERHEAD_SPLIT.json")
    spark.stop()


if __name__ == "__main__":
    main()
