"""Emulate the driver's correctness gate exactly: a VANILLA SparkSession
(none of our session.py conveniences), every ``queries()`` entry executed
at the gate scale factor (default sf0.01 — the driver's), compared
value-by-value and column-by-column against its ``oracle_sql()`` twin in
DuckDB.

Usage:  python scripts/driver_emulation.py [sf_dir]

Exit code 0 iff every entry passes. Run this before ending a round —
the in-repo pytest gate uses sf0.001 for speed, and scale-dependent
divergence (e.g. rounding ties that need more rows to surface) only
shows up here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-emulation")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = len(entry_mod.entry(spark).collect())
    print(f"entry(): {rows} rows {'OK' if rows > 0 else 'EMPTY — FAIL'}")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            got = sorted(str(tuple(r)) for r in df.collect())
            if name in oracles:
                orc = con.sql(oracles[name])
                if sorted(c.lower() for c in df.columns) != sorted(
                    c.lower() for c in orc.columns
                ):
                    failures.append((name, "column mismatch"))
                    continue
                want = sorted(str(tuple(r)) for r in orc.fetchall())
                status = "ok" if got == want else "VALUE MISMATCH"
                if got != want:
                    failures.append((name, "value mismatch"))
            else:
                status = "rows-only"
            print(f"  {name}: {len(got)} rows [{status}]")
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"error: {exc}"))
            print(f"  {name}: ERROR {str(exc)[:120]}")

    if failures:
        print(f"\nFAILURES ({len(failures)}): {[f[0] for f in failures]}")
        return 1
    print(f"\nall {len(qs)} entries pass ({len(oracles)} oracle-checked)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
