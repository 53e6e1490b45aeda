"""Minimal stdlib .xlsx writer — test fixture tooling for the Excel
sheet source (hpv_etl_code_spark/sources/sheets.py). Produces real
OOXML workbooks: shared strings (optionally rich-text runs), inline
strings, numeric cells, sparse rows with explicit A1 refs."""

from __future__ import annotations

import re
import zipfile

_NUM = re.compile(r"-?\d+(\.\d+)?")

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(65 + rem) + letters
    return letters


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def write_xlsx(
    path,
    grid: list[list],
    inline: bool = False,
    rich_text_a1: bool = False,
) -> None:
    """Write ``grid`` (row 1 first; None = blank cell) as a real xlsx.

    ``inline=True`` emits strings as inlineStr cells instead of shared
    strings; ``rich_text_a1=True`` splits the A1 string into two
    rich-text runs (exercises the run-concatenation path)."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    rows_xml = []
    for r, row in enumerate(grid):
        cells = []
        for c, v in enumerate(row):
            if v is None or v == "":
                continue
            ref = f"{_col_letters(c)}{r + 1}"
            sv = str(v)
            if _NUM.fullmatch(sv):
                cells.append(f'<c r="{ref}"><v>{sv}</v></c>')
            elif inline:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{_esc(sv)}</t></is></c>'
                )
            else:
                cells.append(f'<c r="{ref}" t="s"><v>{sref(sv)}</v></c>')
        rows_xml.append(f'<row r="{r + 1}">{"".join(cells)}</row>')

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
    )

    sis = []
    for i, s in enumerate(shared):
        if rich_text_a1 and i == 0 and len(s) > 4:
            # two rich-text runs — the parser must concatenate them
            sis.append(
                f"<si><r><t xml:space=\"preserve\">{_esc(s[:4])}</t></r>"
                f"<r><t xml:space=\"preserve\">{_esc(s[4:])}</t></r></si>"
            )
        else:
            sis.append(f'<si><t xml:space="preserve">{_esc(s)}</t></si>')
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">{"".join(sis)}</sst>'
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def write_xlsx_parts(
    path,
    sheet_xml: str,
    sst_xml: str | None = None,
    workbook_xml: str | None = None,
) -> None:
    """Write a workbook from RAW part XML — adversarial-fixture tooling
    (formula cells, merged ranges, 1904 epoch, truncated sst)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook_xml or _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        if sst_xml is not None:
            z.writestr("xl/sharedStrings.xml", sst_xml)
