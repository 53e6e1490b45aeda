"""Product/ML analytics in one pass: the monitoring suite a team runs
nightly over the event log — drift, experiment readout, engagement,
journeys, data-contract checks — all as catalog entries sharing one
SparkSession (and one set of parquet scans).

Run:  python examples/analytics_suite.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from hpv_etl_code_spark import catalog
    from hpv_etl_code_spark.session import get_spark

    spark = get_spark(app_name="analytics_suite")
    spark.sparkContext.setLogLevel("ERROR")
    entries = catalog.entries()

    print("== Distribution drift (PSI; <0.1 stable, >0.25 drifted) ==")
    for r in entries["psi_value_drift"].fn(spark, sf_dir).collect():
        tag = "TOTAL" if r.bucket == -1 else f"bin {r.bucket:2d}"
        print(f"  {tag}: n_a={r.n_a} n_b={r.n_b} psi={r.psi_term}")

    print("== A/B readout (Welch t per event type) ==")
    for r in entries["ab_welch_ttest"].fn(spark, sf_dir).collect():
        print(
            f"  {r.event_type:10s} t={r.t_stat} df={r.welch_df} "
            f"(n={r.n_a}/{r.n_b})"
        )

    print("== Engagement (DAU/WAU stickiness) ==")
    for r in entries["dau_wau_stickiness"].fn(spark, sf_dir).collect():
        print(f"  week {r.week}: wau={r.wau} stickiness={r.stickiness}")

    print("== Top user journeys (first 3 events) ==")
    top = (
        entries["user_journey_paths"].fn(spark, sf_dir)
        .orderBy("n_users", ascending=False)
        .limit(5)
        .collect()
    )
    for r in top:
        print(f"  {r.n_users:6d}  {r.path}")

    print("== Data-contract checks (FD profile) ==")
    for r in entries["fd_profile_lineitem"].fn(spark, sf_dir).collect():
        verdict = "HOLDS" if r.n_violating == 0 else "violated"
        print(
            f"  {r.fd:34s} {verdict} "
            f"({r.n_violating}/{r.n_groups} groups, +{r.excess_values})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
