"""PDF table source (SURVEY.md C5, the reference's hardest operator).

Reference behavior (down/down_water_prep.py:568-984): for each yearly
PDF, iterate pages; parse the ``*** PWSID = n | SYSTEM NAME = s ***``
banner (C5a); extract the bounded table region with a top=70→45
retry (C5b); recombine split column-pages (C5c); repair headerless
continuation pages (C5d); normalize whitespace via a ``.~.`` sentinel
(C5e). One tabula-JVM call per page, sequential over ~2,000 pages per
year.

Spark-first redesign: the per-PAGE work is inherently sequential
WITHIN a file (continuation pages depend on the previous page's
header), so the unit of parallelism is the FILE. ``binaryFile`` scan →
``mapInPandas`` runs the whole page state machine per file; ten years
of PDFs extract in parallel across executors with zero driver
involvement. At 100 TB (millions of PDFs) the same plan holds: one
task per file, Arrow-batched output, no shuffle until the next
operator.

The actual PDF rasterization/table detection requires a PDF library
that is NOT in this container — the ``extract_text`` step is therefore
pluggable: production would pass a pdfminer/tabula-backed callable;
tests use ``fake_pdf_text_extractor`` over a deterministic text
format. Everything downstream of text extraction (banner parse,
page stitching, header repair, whitespace restore) is real and
tested.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# 16-column contract of the extracted master table
# (down/down_water_prep.py:633-637: "master must have exactly 16 columns")
SAMPLE_COLUMNS = [
    "Sample Location",
    "Contaminant ID",
    "Analysis Result",
    "MCL In Effect",
    "Sample Date",
    "Sample Type",
    "Laboratory ID",
    "Analysis Method",
    "Analysis Date",
    "Sample Received Date",
]
PROVENANCE_COLUMNS = ["SPLIT_PAGES", "PWSID", "SYSTEM NAME", "MAIN_PAGE", "TOP_MARGIN", "SYSNAME_PAGE"]
ALL_COLUMNS = SAMPLE_COLUMNS + PROVENANCE_COLUMNS

PDF_ROWS_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in ALL_COLUMNS] + [T.StructField("source_file", T.StringType())]
)

# C5a: page-group banner '*** PWSID = 6430040 | SYSTEM NAME = GROVE CITY ... ***'
# (down/down_water_prep.py:594-615)
BANNER_RE = re.compile(r"\*{3}\s*PWSID\s*=\s*(\d+)\s*\|\s*SYSTEM NAME\s*=\s*(.*?)\s*\*{3}")

# C5e: whitespace that breaks table alignment is replaced by a sentinel
# during extraction and restored afterwards (down/down_water_prep.py:666-670,236-238)
WS_SENTINEL = ".~."


def parse_banner(page_text: str) -> tuple[str, str] | None:
    """C5a: extract (PWSID, SYSTEM NAME) from a page banner, or None
    for continuation pages without one."""
    m = BANNER_RE.search(page_text)
    if not m:
        return None
    return m.group(1), m.group(2)


def normalize_ws(cell: str) -> str:
    """C5e forward direction: protect embedded newlines/tabs."""
    return re.sub(r"[\r\n\t]+", WS_SENTINEL, cell)


def restore_ws(cell: str) -> str:
    """C5e reverse direction (down/down_water_prep.py:236-238)."""
    return cell.replace(WS_SENTINEL, " ")


def stitch_pages(
    pages: list[dict],
) -> list[dict[str, str]]:
    """Assemble per-page tables into 16-column rows.

    Implements the reference's page state machine semantics
    (down/down_water_prep.py:648-945), re-expressed:

    - a page with a banner starts a new (PWSID, SYSTEM NAME) group
      (C5a); banner-less pages continue the previous group;
    - a page whose first row equals the known header is a fresh
      table; otherwise the page is a headerless continuation and the
      carried header is assumed (C5d);
    - a page with only a LEFT subset of the columns followed by a
      page with the RIGHT remainder is a split column-page; rows are
      recombined positionally (C5c);
    - provenance columns record the page bookkeeping
      (down/down_water_prep.py:185-192).

    Each ``pages`` element: {"page": int, "top_margin": int,
    "header": [str] | None, "rows": [[str]]}.
    """
    out: list[dict[str, str]] = []
    pwsid, sysname, sysname_page = "", "", 0
    carried_header: list[str] | None = None
    pending_left: tuple[list[str], list[list[str]], int] | None = None

    for page in pages:
        banner = parse_banner(page.get("text", ""))
        if banner:
            pwsid, sysname = banner
            sysname_page = page["page"]

        header = page.get("header")
        rows = page.get("rows", [])
        was_split = False
        if header is not None and set(header) == set(SAMPLE_COLUMNS):
            carried_header = header
        elif header is not None and set(header) < set(SAMPLE_COLUMNS):
            # C5c: split column-page — left fragment waits for its right half
            if pending_left is None:
                pending_left = (header, rows, page["page"])
                continue
            lheader, lrows, _lpage = pending_left
            header = lheader + [h for h in header if h not in lheader]
            rows = [lr + rr[: len(header) - len(lr)] for lr, rr in zip(lrows, rows)]
            pending_left = None
            carried_header = header
            was_split = True
        else:
            # C5d: headerless continuation → assume carried header
            if carried_header is None:
                continue
            header = carried_header

        idx = {h: i for i, h in enumerate(header)}
        for r in rows:
            rec = {c: restore_ws(str(r[idx[c]])) if c in idx and idx[c] < len(r) else None for c in SAMPLE_COLUMNS}
            rec["SPLIT_PAGES"] = str(int(was_split))
            rec["PWSID"] = pwsid
            rec["SYSTEM NAME"] = sysname
            rec["MAIN_PAGE"] = str(page["page"])
            rec["TOP_MARGIN"] = str(page.get("top_margin", 70))
            rec["SYSNAME_PAGE"] = str(sysname_page)
            out.append(rec)
    return out


def fake_pdf_text_extractor(raw: bytes) -> list[dict]:
    """Deterministic test stand-in for the PDF page extractor.

    Input format: pages separated by form-feed; first line of a page
    is free text (may hold the banner); a line '#HEADER<TAB>...'
    declares columns; remaining lines are TAB-separated cells. A page
    without #HEADER is a headerless continuation (C5d).
    """
    pages = []
    for i, ptext in enumerate(raw.decode("utf-8").split("\f"), start=1):
        lines = [ln for ln in ptext.split("\n") if ln.strip()]
        header = None
        rows = []
        for ln in lines:
            if ln.startswith("#HEADER\t"):
                header = ln.split("\t")[1:]
            elif "\t" in ln:
                rows.append([normalize_ws(c) for c in ln.split("\t")])
        pages.append({"page": i, "top_margin": 70, "text": lines[0] if lines else "", "header": header, "rows": rows})
    return pages


def real_pdf_text_extractor(raw: bytes) -> list[dict]:
    """Production extractor hook: rasterize pages + detect the bounded
    table area with a top=70 → top=45 retry (C5b,
    down/down_water_prep.py:169-171,618-623). Requires a PDF library
    (pdfminer / tabula) not present in this container."""
    raise NotImplementedError(
        "No PDF library in this environment; pass extractor=fake_pdf_text_extractor "
        "or provide a pdfminer/tabula-backed callable."
    )


def read_pdf_tables(
    spark: SparkSession,
    path: str,
    extractor: Callable[[bytes], list[dict]] | None = None,
) -> DataFrame:
    """C5: distributed PDF-table scan.

    ``binaryFile`` source → one Arrow batch per file → the page state
    machine runs inside ``mapInPandas``. Parallelism = number of
    files; no stage boundary until the next shuffle operator.
    """
    extract = extractor or real_pdf_text_extractor
    binary = spark.read.format("binaryFile").load(path)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            frames = []
            for _, row in batch.iterrows():
                pages = extract(bytes(row["content"]))
                recs = stitch_pages(pages)
                if recs:
                    f = pd.DataFrame(recs)
                    f["source_file"] = row["path"]
                    frames.append(f)
            if frames:
                yield pd.concat(frames, ignore_index=True)[[f.name for f in PDF_ROWS_SCHEMA.fields]]

    return binary.select("path", "content").mapInPandas(process, schema=PDF_ROWS_SCHEMA)
