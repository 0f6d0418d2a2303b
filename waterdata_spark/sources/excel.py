"""Excel sources (SURVEY.md C3/C4) without third-party deps.

The reference reads one-sheet and multi-sheet workbooks with
``pd.read_excel`` (down/down_water_prep.py:257,
direct/direct_water_prep.py:69-74). This container has no
openpyxl/xlrd, so the engine ships a minimal XLSX reader built on the
public OOXML spec (an .xlsx is a zip of XML parts: workbook.xml names
sheets, sharedStrings.xml interns strings, each sheet is rows of
cells with an optional type attribute).

Scale note: workbook dimensions in this domain are small (≤ thousands
of rows — they are hand-maintained state spreadsheets), so parsing on
the driver and distributing via ``createDataFrame`` is the right
plan; the result is then broadcast into joins. A 100 TB input would
never arrive as xlsx.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {
    "r": "http://schemas.openxmlformats.org/package/2006/relationships",
}
_R_ATTR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_index(cell_ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_paths(z: zipfile.ZipFile) -> dict[str, str]:
    """sheet name → zip path, via workbook.xml + its .rels part."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    out = {}
    for sheet in wb.iter(f"{{{_NS['m']}}}sheet"):
        target = rid_to_target.get(sheet.get(_R_ATTR), "")
        if target and not target.startswith("/"):
            target = "xl/" + target.removeprefix("./")
        out[sheet.get("name")] = target.lstrip("/")
    return out


def _read_rows(z: zipfile.ZipFile, sheet_path: str, strings: list[str]) -> list[list[str | float | None]]:
    root = ET.fromstring(z.read(sheet_path))
    rows: list[list] = []
    for row in root.iter(f"{{{_NS['m']}}}row"):
        cells: dict[int, object] = {}
        for c in row.findall("m:c", _NS):
            ref = c.get("r") or ""
            ci = _col_index(ref) if ref else len(cells)
            ctype = c.get("t", "n")
            v = c.find("m:v", _NS)
            if ctype == "inlineStr":
                is_el = c.find("m:is", _NS)
                text = "".join(t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else None
                cells[ci] = text
            elif v is None or v.text is None:
                cells[ci] = None
            elif ctype == "s":
                cells[ci] = strings[int(v.text)]
            elif ctype in ("str", "b"):
                cells[ci] = v.text
            else:  # numeric
                try:
                    cells[ci] = float(v.text)
                except ValueError:
                    cells[ci] = v.text
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    return rows


def read_xlsx_rows(path: str, sheet: str | int = 0) -> tuple[list[str], list[list]]:
    """Parse one sheet → (header, data_rows). Pure python, no Spark."""
    with zipfile.ZipFile(path) as z:
        strings = _shared_strings(z)
        sheets = _sheet_paths(z)
        if isinstance(sheet, int):
            name = list(sheets)[sheet]
        else:
            name = sheet
        rows = _read_rows(z, sheets[name], strings)
    if not rows:
        return [], []
    header = ["" if h is None else str(h) for h in rows[0]]
    width = len(header)
    data = [r[:width] + [None] * (width - len(r)) for r in rows[1:]]
    return header, data


def _to_df(spark: SparkSession, header: list[str], data: list[list]) -> DataFrame:
    # all-string columns: same dynamic-schema discipline as the CSV path;
    # declared casts happen at the pipeline boundary
    str_data = [tuple(None if v is None else (str(int(v)) if isinstance(v, float) and v.is_integer() else str(v)) for v in r) for r in data]
    schema = ", ".join(f"`{h}` string" for h in header)
    return spark.createDataFrame(str_data, schema)


def read_excel_sheet(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """C3: single-sheet Excel scan → DataFrame (header row = columns)."""
    header, data = read_xlsx_rows(path, sheet)
    return _to_df(spark, header, data)


def read_excel_sheets(spark: SparkSession, path: str, sheets: list[str]) -> dict[str, DataFrame]:
    """C4: multi-sheet scan → dict of DataFrames
    (direct/direct_water_prep.py:69-74 reads 'System Info',
    'Violations', 'Data')."""
    return {s: read_excel_sheet(spark, path, s) for s in sheets}
