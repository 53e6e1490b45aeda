"""Per-stage empirical profile of one headline entry (guide §1.1/§7.1:
"open the Spark UI, find the slowest stage" — headless edition).

Runs the entry once warm, once timed, with the UI enabled, then dumps
every stage of the timed run from the REST API: task count, total
executor run time, shuffle read/write, and the first line of the stage
name — enough to see which operator the wall-clock actually goes to
and how many tasks share it (a 1-task stage on local[32] is the
§2.5 input-skew signature).

Usage: python scripts/stage_profile.py <entry> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.plans.profile import materialize
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(
        app_name=f"stage_profile_{entry}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = catalog.headline_queries()[entry]

    materialize(fn(spark, sf_dir))  # warm-up (cache builds, JIT)

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    before = _stage_ids(ui, app_id)

    sc.setJobDescription(f"timed: {entry}")
    t0 = time.perf_counter()
    materialize(fn(spark, sf_dir))
    wall = time.perf_counter() - t0
    sc.setJobDescription(None)

    stages = [
        s
        for s in _get(ui, app_id, "stages?status=complete")
        if s["stageId"] not in before
    ]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"# {entry} timed wall {wall:.3f}s — stages of the timed run:")
    print(f"{'stage':>6} {'tasks':>6} {'runTime_ms':>10} {'shRead':>10} {'shWrite':>10}  name")
    for s in stages:
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>6} "
            f"{s.get('executorRunTime', 0):>10} "
            f"{s.get('shuffleReadBytes', 0):>10} "
            f"{s.get('shuffleWriteBytes', 0):>10}  "
            f"{s.get('description') or s['name'][:90]}"
        )
    spark.stop()


def _get(ui: str, app_id: str, what: str):
    url = f"{ui}/api/v1/applications/{app_id}/{what}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stage_ids(ui: str, app_id: str) -> set[int]:
    try:
        return {s["stageId"] for s in _get(ui, app_id, "stages")}
    except Exception:  # noqa: BLE001 — no stages yet
        return set()


if __name__ == "__main__":
    main()
