"""Quickstart: what a user of the reference pipeline runs here instead.

The reference (``/root/reference/src/main.py``) is executed top-to-bottom
with hardcoded paths and a Snowflake sink. The engine equivalent is
three lines of config + one call — same semantics
(melt → dims → pivot → sentinel scrub → Both/All rollups → UPPERCASE
schema → truncate-load), but lazy, distributed, and incremental-capable.

Run:  python examples/quickstart.py
"""

from __future__ import annotations

import csv
import datetime as dt
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpv_etl_code_spark import JobConfig, get_spark, run_hpv_job  # noqa: E402

WIDE_SHEET = [
    ["HPV vaccination coverage September 2023 to August 2024"],
    [],
    [
        "Local authority",
        "Year 8 females number",
        "Year 8 females number vaccinated",
        "Year 8 males number",
        "Year 8 males number vaccinated",
        "Year 8 females % vaccinated",   # dropped by name (contract)
    ],
    [" camden ", "100", "80", "90", "70", "80%"],
    ["islington", "*", "[E]", "50", "40", "75%"],   # suppression sentinels
]


def main() -> None:
    work = Path(tempfile.mkdtemp())
    (work / "data").mkdir()
    with open(work / "data" / "coverage_2024.csv", "w", newline="") as f:
        csv.writer(f).writerows(WIDE_SHEET)

    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    n = run_hpv_job(
        spark,
        JobConfig(
            data_glob=str(work / "data" / "*.csv"),
            output_path=str(work / "out"),
            extract_date=dt.date(2026, 1, 15),
        ),
    )
    print(f"loaded {n} rows")  # the reference prints the same count
    spark.read.parquet(str(work / "out")).orderBy(
        "BOROUGH_NAME", "YEAR_GROUP_NUMBER", "GENDER_NAME"
    ).show(truncate=False)


if __name__ == "__main__":
    main()
