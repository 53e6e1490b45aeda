"""Spreadsheet-contract sources (reference S1-S3, SURVEY §2.1).

The reference's input contract (``/root/reference/README.md:46-57``):
cell A1 holds descriptive text ending in the academic year, headers live
on row 3, data starts at row 4; one sheet per file; files are discovered
by glob (``src/main.py:17``) and each workbook is read twice — once for
data (``:27``), once headerless for A1 (``:30``).

Spark-first rebuild — **executor-side, single-pass, any file count**:
``spark.read.format("binaryFile")`` lists and reads the files in
parallel (glob pushdown at the source), and an Arrow-batched
``mapInPandas`` stage parses each sheet ONCE, emitting melted rows
``(a1_text, borough, category, value)`` directly — the A1 metadata
travels as a column instead of a driver round-trip, and the reference's
double-read disappears. Downstream, the rows join the exact same
pipeline as wide in-memory frames (plans/hpv_pipeline.py).

CSV is the native format here (layout mirrors the sheet contract).
Excel needs openpyxl, which is not in this container — the reader is
gated behind an import-try and raises ``NotImplementedError`` with the
wiring instructions (same mapInPandas shape, different cell parser).
"""

from __future__ import annotations

import csv
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

MELTED_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("__a1_text", StringType()),
        StructField("Local authority", StringType()),
        StructField("Category", StringType()),
        StructField("Value", StringType()),
    ]
)

HEADER_ROW = 2  # 0-based row 3 — the contract's header line
DATA_ROW = 3  # data from row 4


def _parse_sheet_csv(path: str, raw: bytes) -> Iterator[tuple]:
    """One CSV sheet → melted cells. Blank cells yield None (Excel-blank
    parity: the reference sees NaN, we see NULL)."""
    rows = list(csv.reader(io.StringIO(raw.decode("utf-8"))))
    if len(rows) <= DATA_ROW:
        return
    a1 = rows[0][0] if rows[0] else None
    headers = rows[HEADER_ROW]
    id_col, measure_cols = headers[0], headers[1:]
    for r in rows[DATA_ROW:]:
        if not r or not r[0]:
            continue
        borough = r[0]
        for i, cat in enumerate(measure_cols, start=1):
            v = r[i] if i < len(r) else ""
            yield (path, a1, borough, cat, v if v != "" else None)


def read_sheets_csv(spark: SparkSession, glob_path: str) -> DataFrame:
    """Glob → melted long frame, fully executor-side.

    binaryFile gives (path, modificationTime, length, content); the
    parser runs per Arrow batch. Each file's bytes must fit an executor
    task comfortably — always true for spreadsheet-shaped inputs.
    """
    files = spark.read.format("binaryFile").load(glob_path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                out.extend(_parse_sheet_csv(path, bytes(content)))
            yield pd.DataFrame(
                out, columns=[f.name for f in MELTED_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(parse, MELTED_SCHEMA)


def read_sheets_excel(spark: SparkSession, glob_path: str) -> DataFrame:
    """Excel twin of read_sheets_csv — needs openpyxl (absent here)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Excel ingestion needs openpyxl: swap _parse_sheet_csv for an "
            "openpyxl worksheet iterator (same contract: A1 metadata, "
            "header row 3, data row 4) inside the same binaryFile + "
            "mapInPandas pipeline"
        ) from exc
    raise NotImplementedError("openpyxl wiring not implemented in this container")
