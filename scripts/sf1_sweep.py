"""Full-catalog scale sweep: execute EVERY catalog entry at a given
scale directory and report per-entry wall time + row count — the
harness behind SCALING.md's "full-catalog sf1 sweep" section.

Usage:
    python scripts/make_sf1.py                       # build .scratch/sf1
    python scripts/sf1_sweep.py [sf_dir] [start end]

Chunk with [start end) (registration order) to bound single-process
wall; anything slower than a few seconds or erroring at 10× the bench
scale is either a plan defect (fix it — see the three found in round 3)
or output-inherent (adjudicate it in SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="sf1_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(catalog.entries())[start:end]
    failures = 0
    for name in names:
        fn = catalog.entries()[name].fn
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            print(f"{name:36s} {time.perf_counter() - t0:8.2f}s rows={n}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"{name:36s} ERROR {type(exc).__name__}: {str(exc)[:140]}")
    print(f"done: {len(names)} entries, {failures} errors")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
