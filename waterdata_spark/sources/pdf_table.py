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
``real_pdf_text_extractor`` — geometric table-area detection (C5b)
over stdlib positioned-text decoding with the reference's top=70→45
retry (see :mod:`waterdata_spark.sources.pdf_geom`; validated
row-for-row against all 7 shipped rptinfo year fixtures);
``basic_pdf_text_extractor`` — linear stdlib text decoding (object
graph → FlateDecode content streams → Tj/TJ text ops; verified
against the reference's 92-page shipped PDF) for text-shaped report
tables; ``fake_pdf_text_extractor`` — a deterministic test format.
Everything downstream of extraction (banner parse, page stitching,
header repair, whitespace restore) is shared and tested.
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


def parse_banner_ref(page_text: str) -> tuple[str, str, int | None] | None:
    """C5a, reference-exact: (PWSID, SYSTEM NAME, per-system page no).

    Mirrors down/down_water_prep.py:605-615 character for character —
    including its quirks, which the shipped rptinfo fixtures embed:
    the SYSTEM NAME keeps the leading space left by ``split(' |')``,
    and the trailing per-system page ordinal is removed with
    ``re.sub(' <n>', ...)`` (which strips EVERY occurrence, not just
    the trailing one). Falls back to the lenient regex parse (trimmed
    name, no ordinal) for banners without the trailing ordinal.
    """
    first_line = page_text.split("\n", 1)[0]
    if BANNER_RE.search(first_line) is None:
        m = BANNER_RE.search(page_text)
        if m is None:
            return None
        first_line = page_text[m.start() :].split("\n", 1)[0]
    try:
        t = first_line.replace("***", "").replace(" PWSID = ", "").replace("SYSTEM NAME = ", "")
        parts = t.split(" |")
        sid = int(parts[0])
        sn = parts[1]
        tail = sn.split(" ")[-1]
        snp = int(tail)
        sn = re.sub(" " + tail, "", sn)
        return str(sid), sn, snp
    except (ValueError, IndexError):
        m = BANNER_RE.search(first_line)
        if m is None:
            return None
        return m.group(1), m.group(2), None


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
      recombined positionally (C5c). A headerless page arriving while
      a left fragment is pending, whose rows are no wider than the
      left header, is a left-fragment CARRYOVER (the reference's
      6/7-field case, :777-853): its rows join the pending fragment,
      keeping their own page's provenance;
    - provenance columns record the page bookkeeping with the
      reference's values (:185-192, :727-733): ``SPLIT_PAGES`` is 1
      for single-page tables and 2 for split ones, ``MAIN_PAGE`` /
      ``TOP_MARGIN`` / ``SYSNAME_PAGE`` come from the page that
      emitted the row's LEFT fragment, and ``SYSNAME_PAGE`` is the
      banner's per-system ordinal when present.

    Each ``pages`` element: {"page": int, "top_margin": int,
    "header": [str] | None, "rows": [[str]]}.
    """
    import itertools
    import warnings

    out: list[dict[str, str]] = []
    pwsid, sysname, sysname_page = "", "", 0
    carried_header: list[str] | None = None
    # pending left fragment of a split column-page: header + per-row
    # provenance captured at sighting time, so carryover rows keep
    # their own page's bookkeeping (reference :813-815)
    pending_left: dict | None = None
    # rows emitted by the most recent split merge — the patch target
    # for a following right-fragment carryover page (reference :839)
    last_split_rows = 0
    # the 4/5-field patch writes these columns (reference :877-884;
    # the 4-field case patches only TOP_MARGIN — the reference's
    # assumed_column_headers[1:]-of-empty-list quirk, :886)
    _PATCH5 = ["Sample Type", "Laboratory ID", "Analysis Method", "Analysis Date", "Sample Received Date"]

    def emit(header, tagged_rows, split_pages):
        idx = {h: i for i, h in enumerate(header)}
        for r, (page_no, top_margin, pw, sn, snp) in tagged_rows:
            rec = {}
            for c in SAMPLE_COLUMNS:
                v = r[idx[c]] if c in idx and idx[c] < len(r) else None
                rec[c] = restore_ws(str(v)) if v is not None else None
            rec["SPLIT_PAGES"] = str(split_pages)
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
        warnings.warn(
            f"pdf stitch: page {pending_left['page']} left fragment had no "
            "right half; emitting with NULL right columns",
            stacklevel=2,
        )
        emit(pending_left["header"], pending_left["rows"], 2)
        pending_left = None

    for page in pages:
        banner = parse_banner_ref(page.get("text", ""))
        if banner:
            pwsid, sysname, snp = banner
            sysname_page = snp if snp is not None else page["page"]

        header = page.get("header")
        rows = page.get("rows", [])
        prov = (page["page"], page.get("top_margin", 70), pwsid, sysname, sysname_page)
        # the right-carryover patch may only target rows of the
        # IMMEDIATELY preceding split merge (or a directly preceding
        # patch page); any other page type invalidates the target
        prev_split_rows, last_split_rows = last_split_rows, 0
        if header is not None and set(h for h in header if h is not None) == set(SAMPLE_COLUMNS):
            flush_pending()
            carried_header = header
            emit(header, [(r, prov) for r in rows], 1)
        elif header is not None and set(h for h in header if h is not None) < set(SAMPLE_COLUMNS):
            # C5c: split column-page — left fragment waits for its right
            # half. A true right half brings DISJOINT columns; a page
            # re-showing any of the left's columns is a new fragment,
            # not a continuation → flush the old one first.
            if pending_left is not None and set(header) & set(pending_left["header"]):
                flush_pending()
            if pending_left is None:
                pending_left = {
                    "header": header,
                    "rows": [(r, prov) for r in rows],
                    "page": page["page"],
                }
                continue
            lheader = pending_left["header"]
            lrows = pending_left["rows"]
            if len(lrows) != len(rows):
                warnings.warn(
                    f"pdf stitch: split fragments at page {page['page']} have "
                    f"{len(lrows)} vs {len(rows)} rows; padding, not truncating",
                    stacklevel=2,
                )
            n_left = len(lheader)
            merged_header = lheader + [h for h in header if h not in lheader]
            merged = []
            for lt, rr in itertools.zip_longest(lrows, rows):
                lr, lprov = lt if lt is not None else ([None] * n_left, prov)
                full = list(lr) + [None] * (n_left - len(lr))
                full = full[:n_left] + (list(rr[: len(merged_header) - n_left]) if rr is not None else [])
                merged.append((full, lprov))
            pending_left = None
            carried_header = merged_header
            emit(merged_header, merged, 2)
            last_split_rows = len(merged)
        elif (
            pending_left is not None
            and rows
            and max(len(r) for r in rows) <= len(pending_left["header"])
        ):
            # left-fragment carryover (reference 6/7-field case): the
            # split table's left half continued onto this page without
            # a header; rows wait with the fragment, tagged with THIS
            # page's provenance
            pending_left["rows"].extend((r, prov) for r in rows)
        elif (
            header is None
            and rows
            and prev_split_rows >= len(rows)
            and all(len(r) in (4, 5) for r in rows)
        ):
            # right-fragment carryover (reference 4/5-field case,
            # :839-931): the split's right half wrapped onto this page;
            # its k rows PATCH the last k emitted rows in place —
            # 5-field rows overwrite Sample Type + the right columns
            # (with the DISTRIBUTIO-N wrap repair) and both widths flip
            # TOP_MARGIN to this page's (the 45 re-read)
            k = len(rows)
            for j, r in enumerate(rows):
                target = out[-k + j]
                if len(r) == 5:
                    for name, v in zip(_PATCH5, r):
                        if v is None:
                            target[name] = None
                        else:
                            v = str(v).replace("DISTRIBUTIO" + WS_SENTINEL + "N", "DISTRIBUTION")
                            target[name] = restore_ws(v).replace("DISTRIBUTIO N", "DISTRIBUTION")
                target["TOP_MARGIN"] = str(page.get("top_margin", 70))
            last_split_rows = prev_split_rows  # consecutive patch pages allowed
        else:
            # C5d: headerless continuation → assume carried header. A
            # pending left fragment can't be continued by a headerless
            # full-width page, so it is flushed as partial.
            flush_pending()
            if carried_header is None:
                continue
            emit(carried_header, [(r, prov) for r in rows], 1)
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
    """Production extractor hook (C5b): geometric table-area detection
    with the top=70 → top=45 retry (down/down_water_prep.py:169-171,
    618-623), built on the stdlib positioned-text decoder in
    :mod:`waterdata_spark.sources.pdf_geom` — no tabula/pdfminer
    needed. Validated row-for-row against the reference's shipped
    rptinfo2014.csv fixture (tests/test_pdf_geom.py)."""
    from waterdata_spark.sources.pdf_geom import geometric_pdf_extractor

    return geometric_pdf_extractor(raw)


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

# (the old whole-file _OBJ_RE/_STREAM_RE scans were removed: binary
# FlateDecode payloads can fake object boundaries — see _parse_objects)
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


def _trim_stream(data: bytes) -> bytes:
    """Remove at most ONE EOL before 'endstream' (PDF 1.7 §7.3.8) —
    ``strip(b"\\r\\n")`` would eat legitimate trailing 0x0A/0x0D bytes
    of the compressed payload (~2/256 of FlateDecode streams)."""
    if data.endswith(b"\r\n"):
        return data[:-2]
    if data.endswith(b"\n") or data.endswith(b"\r"):
        return data[:-1]
    return data


_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_OR_END_RE = re.compile(rb"stream\r?\n|endobj")
# negative lookahead: '/Length 5 0 R' is an INDIRECT length reference,
# not a byte count — matching its '5' would mis-skip the stream
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")


def _parse_objects(raw: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Stream-aware sequential object scan: num → (body, stream data).

    A whole-file regex scan corrupts on binary FlateDecode payloads —
    compressed bytes can contain ``endobj`` / ``endstream`` / ``N 0
    obj`` sequences that fake object boundaries. This parser walks the
    file once, skipping each stream payload via its ``/Length`` (plain
    integer; indirect-ref lengths fall back to the ``endstream``
    scan), so payload bytes are never interpreted as structure.
    """
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    n = len(raw)
    while True:
        m = _OBJ_HEAD_RE.search(raw, pos)
        if not m:
            break
        num = int(m.group(1))
        start = m.end()
        sm = _STREAM_OR_END_RE.search(raw, start)
        if sm is None:
            objects[num] = (raw[start:], None)
            break
        if sm.group().startswith(b"stream"):
            data_start = sm.end()
            lm = _LENGTH_RE.search(raw, start, sm.start())
            if lm:
                data_end = data_start + int(lm.group(1))
                data = raw[data_start:data_end]
            else:
                es = raw.find(b"endstream", data_start)
                data_end = es if es >= 0 else n
                data = _trim_stream(raw[data_start:data_end])
            eo = raw.find(b"endobj", data_end)
            end = eo if eo >= 0 else n
            objects[num] = (raw[start : sm.start()], data)
            pos = end + 6
        else:
            objects[num] = (raw[start : sm.start()], None)
            pos = sm.end()
    return objects


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

    objects = _parse_objects(raw)

    def content_of(num: int) -> bytes:
        data = objects.get(num, (b"", None))[1]
        if data is None:
            return b""
        try:
            return zlib.decompress(data)
        except Exception:
            return data  # uncompressed stream

    pages: list[str] = []
    for num in sorted(objects):
        body = objects[num][0]
        if not _PAGE_RE.search(body):
            continue
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        refs = [int(cm.group(1))] if cm.group(1) else [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))]
        content = b"".join(content_of(r) for r in refs)
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
