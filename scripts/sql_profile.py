"""Per-OPERATOR empirical profile of one headline entry (guide §7.1's
"SQL / DataFrame tab" — headless edition, complementing
scripts/stage_profile.py which stops at stage granularity).

Runs the entry once warm, then executes a fresh instance's OWN physical
plan (the bench's materialize seam) and walks the executed plan's
SQLMetric values — rows out, time metrics, build/broadcast/sort/shuffle
times — per node. This is the map from wall-clock to operator that
stage granularity cannot give when one stage fuses a dozen operators.

Usage: python scripts/sql_profile.py <entry> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TIMEY = (
    "time",
    "Time",
    "numOutputRows",
    "spillSize",
    "peakMemory",
    "shuffleBytesWritten",
    "dataSize",
)


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.plans.profile import materialize
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name=f"sql_profile_{entry}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = catalog.headline_queries()[entry]

    materialize(fn(spark, sf_dir))  # warm-up (cache builds, JIT)

    df = fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    t0 = time.perf_counter()
    rows = plan.execute().count()
    wall = time.perf_counter() - t0
    print(f"# {entry} timed wall {wall:.3f}s rows {rows} — executed-plan nodes:")

    root = plan
    if "Adaptive" in root.getClass().getName():
        root = root.executedPlan()

    def node_metrics(node) -> dict:
        out = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k = kv._1()
            if any(s in k for s in _TIMEY):
                v = kv._2().value()
                if v:
                    out[k] = v
        return out

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        mets = node_metrics(node)
        if mets:
            pretty = ", ".join(f"{k}={v}" for k, v in sorted(mets.items()))
            print(f"{'  ' * depth}{name}: {pretty}")
        cls = node.getClass().getName()
        if "QueryStage" in cls:
            walk(node.plan(), depth + 1)
        for i in range(node.children().size()):
            walk(node.children().apply(i), depth + 1)

    walk(root, 0)
    spark.stop()


if __name__ == "__main__":
    main()
