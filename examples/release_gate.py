"""The pre-publish release gate a dataset team runs before shipping a
new corpus snapshot:

    raw tables
      → data-quality expectations   (nulls, keys, FKs, ranges)
      → deterministic split labels  (portable hash — stable forever)
      → plan lint                   (scale anti-pattern check on the
                                     queries about to ship)

Run:

    python examples/release_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpv_etl_code_spark import (  # noqa: E402
    assert_scalable,
    data_quality_report,
    get_spark,
    lint_plan,
    load_table,
    split_assign,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="release-gate")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    # 1. expectations — fail the release on any HARD violation. The
    # uniqueness check is reported but not asserted here: the synthetic
    # corpus genuinely contains duplicate (l_orderkey, l_linenumber)
    # rows, which is exactly the kind of fact this gate exists to
    # surface before a snapshot ships.
    report = data_quality_report(
        lineitem,
        not_null=("l_orderkey", "l_quantity"),
        unique_key=("l_orderkey", "l_linenumber"),
        fk=(("l_orderkey", orders, "o_orderkey"),),
        ranges=(("l_discount", 0.0, 0.1),),
    )
    print("expectations:")
    hard_bad = 0
    for r in report.collect():
        print(f"  {r.check_name}: {r.n_violations}")
        if not r.check_name.startswith("unique:"):
            hard_bad += r.n_violations
    assert hard_bad == 0, "release blocked: data-quality violations"

    # 2. stable split labels travel WITH the snapshot
    split = split_assign(docs, "doc_id", val_frac=0.05, test_frac=0.05)
    print("split sizes:")
    for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect():
        print(f"  {r.split}: {r.n}")

    # 3. lint the plans about to ship — same gate the engine's own
    # catalog passes
    for name, df in (("dq_report", report), ("split", split)):
        findings = lint_plan(df)
        print(f"lint {name}: {[f.rule for f in findings] or 'clean'}")
        assert_scalable(df)

    print("release gate: PASS")
    spark.stop()


if __name__ == "__main__":
    main()
