"""End-to-end job test: spreadsheet-contract CSV files on disk →
distributed melt → pipeline → parquet sink; result must equal the same
fixture fed through the in-memory wide path (two independent routes,
one answer)."""

from __future__ import annotations

import csv

import pytest

from hpv_etl_code_spark.plans import hpv_fixture
from hpv_etl_code_spark.plans.hpv_pipeline import run_pipeline
from hpv_etl_code_spark.plans.job import JobConfig, run_hpv_job
from hpv_etl_code_spark.sources.sheets import read_sheets_excel


def _write_sheet(path, cols, rows, a1):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([a1])
        w.writerow([])
        w.writerow(cols)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])


@pytest.fixture()
def sheet_dir(tmp_path):
    for i, (cols, rows, a1) in enumerate(hpv_fixture.FILES, 1):
        _write_sheet(tmp_path / f"file{i}.csv", cols, rows, a1)
    return tmp_path


def test_csv_job_equals_inmemory_pipeline(spark, sheet_dir, tmp_path):
    out_path = str(tmp_path / "out")
    cfg = JobConfig(
        data_glob=str(sheet_dir / "*.csv"),
        output_path=out_path,
        extract_date=hpv_fixture.EXTRACT_DATE,
    )
    n = run_hpv_job(spark, cfg)
    assert n > 0

    got = {
        tuple(r) for r in spark.read.parquet(out_path).collect()
    }
    want = {
        tuple(r)
        for r in run_pipeline(
            hpv_fixture.build_spark_files(spark), hpv_fixture.EXTRACT_DATE
        ).collect()
    }
    assert got == want


def test_job_config_from_env():
    cfg = JobConfig.from_env(
        {
            "HPV_DATA_GLOB": "/data/*.csv",
            "HPV_OUTPUT_PATH": "/out",
            "HPV_EXTRACT_DATE": "2026-01-15",
        }
    )
    assert cfg.data_glob == "/data/*.csv"
    assert str(cfg.extract_date) == "2026-01-15"


def test_excel_reader_is_gated(spark):
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_sheets_excel(spark, "/nonexistent/*.xlsx")
