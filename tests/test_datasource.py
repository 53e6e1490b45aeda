"""The `hpv_sheets` Python Data Source (sources/datasource.py): reader
syntax must be a third route to the same melted rows as the
binaryFile+mapInPandas route, batch and streaming."""

from __future__ import annotations

import pytest

from hpv_etl_code_spark.plans import hpv_fixture
from hpv_etl_code_spark.sources.datasource import HpvSheetsDataSource
from hpv_etl_code_spark.sources.sheets import read_sheets_csv, read_sheets_excel


def _key(rows):
    return {
        (r["__a1_text"], r["Local authority"], r["Category"], r["Value"])
        for r in rows
    }


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(HpvSheetsDataSource)


@pytest.fixture()
def xlsx_dir(tmp_path):
    from tests.xlsx_util import write_xlsx

    for i, (cols, rows, a1) in enumerate(hpv_fixture.FILES, 1):
        write_xlsx(
            tmp_path / f"file{i}.xlsx",
            [[a1], [], list(cols), *[list(r) for r in rows]],
            inline=(i % 2 == 0),
        )
    return tmp_path


def test_batch_source_equals_mapinpandas_route(spark, xlsx_dir):
    via_source = spark.read.format("hpv_sheets").load(str(xlsx_dir / "*.xlsx"))
    via_lib = read_sheets_excel(spark, str(xlsx_dir / "*.xlsx"))
    assert via_source.schema == via_lib.schema
    assert _key(via_source.collect()) == _key(via_lib.collect())
    # one partition per file — executor-side parallel parse
    assert via_source.rdd.getNumPartitions() == len(hpv_fixture.FILES)


def test_batch_source_csv_format_inferred(spark, tmp_path):
    import csv

    for i, (cols, rows, a1) in enumerate(hpv_fixture.FILES, 1):
        with open(tmp_path / f"f{i}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([a1])
            w.writerow([])
            w.writerow(cols)
            w.writerows([["" if v is None else v for v in r] for r in rows])
    via_source = spark.read.format("hpv_sheets").load(str(tmp_path / "*.csv"))
    via_lib = read_sheets_csv(spark, str(tmp_path / "*.csv"))
    assert _key(via_source.collect()) == _key(via_lib.collect())


def test_bad_format_raises_on_driver(spark, tmp_path):
    with pytest.raises(Exception, match="unknown format"):
        spark.read.format("hpv_sheets").option("format", "ods").load(
            str(tmp_path / "*.ods")
        ).collect()


def test_stream_source_consumes_incremental_drops(spark, tmp_path):
    """Name-ordered file drops become micro-batches; the cumulative sink
    equals a batch read of everything dropped so far."""
    from tests.xlsx_util import write_xlsx

    drop = tmp_path / "drop"
    drop.mkdir()
    files = list(enumerate(hpv_fixture.FILES, 1))

    def write(i, spec):
        cols, rows, a1 = spec
        write_xlsx(drop / f"{i:05d}.xlsx", [[a1], [], list(cols), *map(list, rows)])

    write(*files[0])
    stream = spark.readStream.format("hpv_sheets").load(str(drop / "*.xlsx"))
    q = (
        stream.writeStream.format("memory")
        .queryName("sheet_drops")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for spec in files[1:]:
            write(*spec)
        q.processAllAvailable()
        got = _key(spark.sql("SELECT * FROM sheet_drops").collect())
    finally:
        q.stop()
    want = _key(read_sheets_excel(spark, str(drop / "*.xlsx")).collect())
    assert got == want and got


def test_stream_source_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """Kill the query, drop more files, restart from the SAME checkpoint:
    the resumed query must process only files after the committed offset
    — each sheet lands in the sink exactly once."""
    from tests.xlsx_util import write_xlsx

    drop = tmp_path / "drop"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drop.mkdir()
    files = list(enumerate(hpv_fixture.FILES, 1))

    def write(i, spec):
        cols, rows, a1 = spec
        write_xlsx(drop / f"{i:05d}.xlsx", [[a1], [], list(cols), *map(list, rows)])

    def run_once():
        stream = spark.readStream.format("hpv_sheets").load(str(drop / "*.xlsx"))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write(*files[0])
    run_once()
    for spec in files[1:]:
        write(*spec)
    run_once()

    sunk = spark.read.parquet(out)
    want = read_sheets_excel(spark, str(drop / "*.xlsx"))
    assert sunk.count() == want.count()  # exactly-once: no replayed rows
    assert _key(sunk.collect()) == _key(want.collect())
