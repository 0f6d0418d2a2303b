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

Extraction is a pluggable hook with three implementations:
``basic_pdf_text_extractor`` — a REAL stdlib PDF text decoder (object
graph → FlateDecode content streams → Tj/TJ text ops; verified
against the reference's 92-page shipped PDF) for text-shaped report
tables; ``fake_pdf_text_extractor`` — a deterministic test format;
``real_pdf_text_extractor`` — the gated hook for geometric
table-area detection (tabula/pdfminer-grade layout analysis, which
this container's library set cannot do). Everything downstream of
extraction (banner parse, page stitching, header repair, whitespace
restore) is shared and tested.
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
    import itertools
    import warnings

    out: list[dict[str, str]] = []
    pwsid, sysname, sysname_page = "", "", 0
    carried_header: list[str] | None = None
    # (header, rows, page_no, top_margin, pwsid, sysname, sysname_page)
    # — group state is captured at sighting time so a flush emits under
    # the group the fragment belonged to, not a later group's
    pending_left: tuple | None = None

    def emit(header, rows, page_no, top_margin, was_split, pw, sn, snp):
        idx = {h: i for i, h in enumerate(header)}
        for r in rows:
            rec = {
                c: restore_ws(str(r[idx[c]])) if c in idx and idx[c] < len(r) else None
                for c in SAMPLE_COLUMNS
            }
            rec["SPLIT_PAGES"] = str(int(was_split))
            rec["PWSID"] = pw
            rec["SYSTEM NAME"] = sn
            rec["MAIN_PAGE"] = str(page_no)
            rec["TOP_MARGIN"] = str(top_margin)
            rec["SYSNAME_PAGE"] = str(snp)
            out.append(rec)

    def flush_pending():
        # an unpaired left fragment is a real partial-header page: emit
        # its rows with NULLs for the missing columns instead of
        # silently dropping them
        nonlocal pending_left
        if pending_left is None:
            return
        ph, prows, ppage, ptm, ppw, psn, psnp = pending_left
        warnings.warn(
            f"pdf stitch: page {ppage} left fragment had no right half; "
            "emitting with NULL right columns",
            stacklevel=2,
        )
        emit(ph, prows, ppage, ptm, False, ppw, psn, psnp)
        pending_left = None

    for page in pages:
        banner = parse_banner(page.get("text", ""))
        if banner:
            pwsid, sysname = banner
            sysname_page = page["page"]

        header = page.get("header")
        rows = page.get("rows", [])
        was_split = False
        if header is not None and set(header) == set(SAMPLE_COLUMNS):
            flush_pending()
            carried_header = header
        elif header is not None and set(header) < set(SAMPLE_COLUMNS):
            # C5c: split column-page — left fragment waits for its right
            # half. A true right half brings DISJOINT columns; a page
            # re-showing any of the left's columns is a new fragment,
            # not a continuation → flush the old one first.
            if pending_left is not None and set(header) & set(pending_left[0]):
                flush_pending()
            if pending_left is None:
                pending_left = (
                    header, rows, page["page"], page.get("top_margin", 70),
                    pwsid, sysname, sysname_page,
                )
                continue
            lheader, lrows, _lp, _ltm, _lpw, _lsn, _lsnp = pending_left
            if len(lrows) != len(rows):
                warnings.warn(
                    f"pdf stitch: split fragments at page {page['page']} have "
                    f"{len(lrows)} vs {len(rows)} rows; padding, not truncating",
                    stacklevel=2,
                )
            n_left = len(lheader)
            header = lheader + [h for h in header if h not in lheader]
            rows = [
                (lr if lr is not None else [""] * n_left)
                + (rr[: len(header) - n_left] if rr is not None else [])
                for lr, rr in itertools.zip_longest(lrows, rows)
            ]
            pending_left = None
            carried_header = header
            was_split = True
        else:
            # C5d: headerless continuation → assume carried header. A
            # pending left fragment can't be continued by a headerless
            # full-width page, so it is flushed as partial.
            flush_pending()
            if carried_header is None:
                continue
            header = carried_header

        emit(
            header, rows, page["page"], page.get("top_margin", 70),
            was_split, pwsid, sysname, sysname_page,
        )
    flush_pending()
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


# ---------------------------------------------------------------------------
# Minimal stdlib PDF text decoder (no third-party PDF lib in this container).
#
# Built from the public PDF 1.7 spec structure: a PDF is a graph of
# numbered objects; /Type /Page objects reference /Contents streams
# (usually FlateDecode); text is drawn by Tj/TJ/'/" operators inside
# BT...ET blocks. This decoder recovers the text runs per page — enough
# for the banner parse (C5a) and line-shaped report tables. It does NOT
# do geometric table-area detection (tabula's job in the reference,
# down/down_water_prep.py:655-661): hex-encoded CID fonts and layout
# reconstruction remain for a real PDF library via the extractor hook.
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[(.*?)\])", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_STRING_OP_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^()\\])*)\)\s*(?:Tj|'|\")"  # (..) Tj / ' / "
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"  # [ .. ] TJ
    rb"|(?P<nl>T\*|TD|Td)"  # line moves → newline
)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^()\\])*\)|(-?\d+(?:\.\d+)?)")
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape_pdf_string(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i : i + 1]
        if c == b"\\" and i + 1 < len(s):
            nxt = s[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd
                j = i + 1
                while j < min(i + 4, len(s)) and s[j : j + 1].isdigit():
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_content_text(content: bytes) -> str:
    """Recover the text runs from one page's content stream."""
    parts: list[str] = []
    for m in _STRING_OP_RE.finditer(content):
        if m.group("nl") is not None:
            parts.append("\n")
        elif m.group("s") is not None:
            parts.append(_unescape_pdf_string(m.group("s")).decode("latin-1"))
        else:
            arr = m.group("arr") or b""
            for am in _ARR_STR_RE.finditer(arr):
                if am.group(1) is not None:
                    # large negative kern = inter-word gap
                    if float(am.group(1)) < -150:
                        parts.append(" ")
                else:
                    parts.append(_unescape_pdf_string(am.group(0)[1:-1]).decode("latin-1"))
        parts.append("")
    return "".join(parts)


def extract_pdf_text_pages(raw: bytes) -> list[str]:
    """Pure-stdlib PDF → list of per-page text strings, in page order.

    Handles FlateDecode content streams and literal-string text ops;
    hex/CID-encoded text is skipped (needs font CMaps → real PDF lib).
    """
    import zlib

    objects: dict[int, bytes] = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(raw)}

    def content_of(obj_body: bytes) -> bytes:
        sm = _STREAM_RE.search(obj_body)
        if not sm:
            return b""
        data = sm.group(1).strip(b"\r\n")
        try:
            return zlib.decompress(data)
        except Exception:
            return data  # uncompressed stream

    pages: list[str] = []
    for num in sorted(objects):
        body = objects[num]
        if not _PAGE_RE.search(body):
            continue
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        refs = [int(cm.group(1))] if cm.group(1) else [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))]
        content = b"".join(content_of(objects.get(r, b"")) for r in refs)
        pages.append(_decode_content_text(content))
    return pages


def basic_pdf_text_extractor(raw: bytes) -> list[dict]:
    """Real-decode extractor hook for ``read_pdf_tables``: stdlib text
    recovery per page; rows are TAB-split lines (text-aligned report
    tables); geometric table detection still needs a real PDF lib."""
    pages = []
    for i, text in enumerate(extract_pdf_text_pages(raw), start=1):
        lines = [ln for ln in text.split("\n") if ln.strip()]
        header = None
        rows = []
        for ln in lines:
            cells = [c for c in ln.split("\t") if c != ""]
            if len(cells) > 1:
                if header is None and set(cells) <= set(ALL_COLUMNS):
                    header = cells
                else:
                    rows.append(cells)
        pages.append({"page": i, "top_margin": 70, "text": text, "header": header, "rows": rows})
    return pages
