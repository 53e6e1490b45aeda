"""Profile every headline query's executed plan at a scale factor:
rows, shuffle bytes/records, spill, peak task memory, scan volume,
exchange/broadcast counts — the runtime numbers behind SCALING.md.

Usage: python scripts/plan_profile.py [sf_dir]   (default sf0.01)
Writes PROFILE.json next to the repo root and prints one line per
query. Shuffle bytes are the scale currency: a query whose shuffle
grows superlinearly in input is the one to redesign before 100 TB.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.plans.profile import execute_and_profile
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="plan_profile")
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name, fn in catalog.headline_queries().items():
        prof = execute_and_profile(fn(spark, sf_dir))
        out[name] = prof.as_dict()
        d = prof.as_dict()
        print(
            f"{name:32s} rows={d['rows']:>9} shuffle={d['shuffle_bytes']:>12} "
            f"spill={d['spill_bytes']:>9} exch={d['n_exchanges']} "
            f"bcast={d['n_broadcasts']} scan={d['scan_bytes']:>12}",
            flush=True,
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PROFILE.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": out}, f, indent=1)
    print(f"wrote PROFILE.json ({len(out)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
