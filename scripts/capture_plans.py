"""Capture ``explain("formatted")`` for headline queries into
``plans/r{N}/<query>_{tag}.txt`` — the optimization-round evidence files
(the judge reads these instead of running Spark).

Usage: python scripts/capture_plans.py <round_tag> <before|after> [sf_dir] [entry ...]

Example: python scripts/capture_plans.py r09 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    round_tag = sys.argv[1]
    tag = sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest.pop(0) if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    only = set(rest)

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name=f"capture_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", round_tag)
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in catalog.headline_queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"PLAN CAPTURE FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n")
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
