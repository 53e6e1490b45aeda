"""Audit which catalog entries `.count()` hollows out (round-9 finding).

For every catalog entry, compare the operator set of the entry's own
optimized plan against the optimized plan of ``df.groupBy().count()``.
Catalyst prunes row-preserving subtrees under a count aggregate — pure
projections collapse to a parquet-footer count, windows with no
downstream filter vanish, unique-key left joins are eliminated — so any
harness that times ``.count()`` under-measures those entries (bench.py
and scripts/scale_rehearsal.py timed exactly that through round 9; both
now use plans/profile.py::materialize).

Detection here is operator-shape-based and catches the structural
classes only. A subtler class it can NOT see: aggregate MEASURES are
pruned to grouping keys (an outer count needs only the group count),
so every aggregate expression — including DECIMAL exact sums — was
skipped under count() even when the Aggregate node survives. There is
no plan-shape signal for that; the materialize() fix covers it by
construction.

This script is the regression radar: it prints HOLLOW (count plan
retains no Join/Window/Generate/Expand the full plan has) and PARTIAL
(some such operator pruned) lists. Run after adding entries; anything
listed is fine CORRECTNESS-wise (the driver gate materializes via
toPandas) but must never again be timed with ``.count()``.

Usage: python scripts/audit_count_pruning.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERESTING = {"Join", "Window", "Generate", "Expand"}


def _ops(plan: str) -> set[str]:
    return set(re.findall(r"^[\s:+-]*([A-Za-z]+) ", plan, re.M))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="audit_count_pruning")
    spark.sparkContext.setLogLevel("ERROR")
    hollow, partial, errs = [], [], []
    for name, e in sorted(catalog.entries().items()):
        try:
            df = e.fn(spark, sf_dir)
            full = _ops(df._jdf.queryExecution().optimizedPlan().toString())
            cnt = _ops(
                df.groupBy().count()._jdf.queryExecution().optimizedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            errs.append((name, str(exc)[:80]))
            continue
        if (INTERESTING & full) and not (INTERESTING & cnt):
            hollow.append(name)
        elif (INTERESTING & full) - cnt:
            partial.append((name, sorted((INTERESTING & full) - cnt)))
    print("HOLLOW (count() collapses to source count):")
    for n in hollow:
        print(f"  {n}")
    print("PARTIAL (count() drops some operators):")
    for n, lost in partial:
        print(f"  {n}: {lost}")
    if errs:
        print("ERRORS:")
        for n, msg in errs:
            print(f"  {n}: {msg}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
