"""Geometric PDF table extraction (C5b) — pure-stdlib positioned text.

The reference extracts each page's table with tabula over a bounded
area ``[top, 0, 612, 792]`` and retries ``top=70 → top=45`` when the
header row is cut mid-wrap (down/down_water_prep.py:169-171,655-661,
691-698). This module replaces that JVM dependency with a stdlib
implementation built from the public PDF 1.7 spec:

1. tokenize each page's content stream and interpret the text-state
   operators (``Tm/Td/TD/T*/TL``) to recover positioned text runs
   ``(x, y, text)``;
2. clip the runs to the table area (``top`` points measured from the
   top edge, mirroring tabula's ``area`` convention);
3. rebuild the table stream-mode style: cluster run x-origins into
   columns, group lines into row blocks by vertical gap (wrapped cell
   lines sit closer than adjacent rows), and join wrapped fragments
   with the ``.~.`` whitespace sentinel (C5e) exactly where tabula
   produced ``\\r`` linebreaks for the reference;
4. classify the first block: a complete header, a CUT header (any
   cell is a strict word-fragment of a known column name — the
   signature the reference detects as ``'Sample' in headers``,
   down/down_water_prep.py:691), or leading data (headerless
   continuation page, C5d). A cut header aborts the attempt and the
   caller retries with the smaller top margin.

The output page dicts feed :func:`waterdata_spark.sources.pdf_table.
stitch_pages` unchanged — extraction geometry and page stitching stay
independently testable.
"""

from __future__ import annotations

import re
import warnings
from bisect import bisect_right

from waterdata_spark.sources.pdf_table import (
    SAMPLE_COLUMNS,
    WS_SENTINEL,
    _CONTENTS_RE,
    _PAGE_RE,
    _parse_objects,
    _REF_RE,
    _unescape_pdf_string,
)

TOP1 = 70  # down/down_water_prep.py:169 — works for most pages
TOP2 = 45  # down/down_water_prep.py:171 — retry when the header is cut

_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s\[\]<>()/%]*")
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")

# every contiguous word-subsequence of a column name that is NOT the
# full name — the vocabulary a cut (partially clipped) header row is
# made of. Data cells (ids, dates, measurements) never collide.
_HEADER_FRAGMENTS: set[str] = set()
for _name in SAMPLE_COLUMNS:
    _words = _name.split()
    for _a in range(len(_words)):
        for _b in range(_a + 1, len(_words) + 1):
            _frag = " ".join(_words[_a:_b])
            if _frag != _name:
                _HEADER_FRAGMENTS.add(_frag)


def _scan_string(content: bytes, i: int) -> tuple[bytes, int]:
    """Scan a PDF literal string starting at ``content[i] == '('``.
    Returns (raw inner bytes with escapes intact, index past ')')."""
    depth = 0
    j = i
    n = len(content)
    while j < n:
        c = content[j : j + 1]
        if c == b"\\":
            j += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return content[i + 1 : j], j + 1
        j += 1
    return content[i + 1 :], n


def _tokenize(content: bytes):
    """Content-stream scanner: yields ('str'|'arr'|'num'|'name'|'op', value)."""
    i, n = 0, len(content)
    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n\f\x00":
            i += 1
        elif c == b"%":
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _scan_string(content, i)
            yield ("str", s)
        elif c == b"[":
            i += 1
            arr: list[tuple[str, object]] = []
            while i < n:
                cc = content[i : i + 1]
                if cc in b" \t\r\n":
                    i += 1
                elif cc == b"]":
                    i += 1
                    break
                elif cc == b"(":
                    s, i = _scan_string(content, i)
                    arr.append(("str", s))
                elif cc == b"<":
                    j = content.find(b">", i)
                    if j < 0:
                        break
                    arr.append(("hex", content[i + 1 : j]))
                    i = j + 1
                else:
                    m = _NUM_RE.match(content, i)
                    if m:
                        arr.append(("num", float(m.group())))
                        i = m.end()
                    else:
                        i += 1
            yield ("arr", arr)
        elif c == b"<":
            # dict <<..>> or hex string — neither carries table text here
            i += 2 if content[i + 1 : i + 2] == b"<" else 1
        elif c == b"/":
            m = _NAME_RE.match(content, i)
            yield ("name", m.group())
            i = m.end()
        else:
            m = _NUM_RE.match(content, i)
            if m and m.end() > i:
                yield ("num", float(m.group()))
                i = m.end()
            else:
                m = _OP_RE.match(content, i)
                if m and m.end() > i:
                    yield ("op", m.group().decode("latin-1"))
                    i = m.end()
                else:
                    i += 1


def positioned_runs(content: bytes) -> list[tuple[float, float, str]]:
    """Interpret one page's content stream → [(x, y, text)] runs.

    Tracks the text line matrix through Tm/Td/TD/T*/TL (translation
    only — DWRS report pages draw unrotated, unscaled text); TJ kern
    gaps below -150/1000 em become inter-word spaces, matching the
    linear decoder's heuristic.
    """
    runs: list[tuple[float, float, str]] = []
    x = y = lx = ly = 0.0
    tl = 0.0
    stack: list[tuple[str, object]] = []

    def _emit(raw: bytes) -> None:
        runs.append((x, y, _unescape_pdf_string(raw).decode("latin-1")))

    for kind, val in _tokenize(content):
        if kind != "op":
            stack.append((kind, val))
            continue
        op = val
        if op == "BT":
            x = y = lx = ly = 0.0
        elif op == "Tm" and len(stack) >= 6:
            a = [v for t, v in stack[-6:] if t == "num"]
            if len(a) == 6:
                lx, ly = a[4], a[5]
                x, y = lx, ly
        elif op in ("Td", "TD") and len(stack) >= 2 and stack[-1][0] == "num":
            tx, ty = float(stack[-2][1]), float(stack[-1][1])
            lx += tx
            ly += ty
            x, y = lx, ly
            if op == "TD":
                tl = -ty
        elif op == "T*":
            ly -= tl
            x, y = lx, ly
        elif op == "TL" and stack and stack[-1][0] == "num":
            tl = float(stack[-1][1])
        elif op == "Tj" and stack and stack[-1][0] == "str":
            _emit(stack[-1][1])
        elif op in ("'", '"'):
            ly -= tl
            x, y = lx, ly
            strs = [v for t, v in stack if t == "str"]
            if strs:
                _emit(strs[-1])
        elif op == "TJ" and stack and stack[-1][0] == "arr":
            parts: list[str] = []
            for t, v in stack[-1][1]:
                if t == "str":
                    parts.append(_unescape_pdf_string(v).decode("latin-1"))
                elif t == "num" and v < -150:
                    parts.append(" ")
            runs.append((x, y, "".join(parts)))
        stack.clear()
    return runs


def positioned_pages(raw: bytes) -> list[dict]:
    """Whole PDF → per-page {'width', 'height', 'runs'} in page order."""
    import zlib

    objects = _parse_objects(raw)

    def content_of(num: int) -> bytes:
        data = objects.get(num, (b"", None))[1]
        if data is None:
            return b""
        try:
            return zlib.decompress(data)
        except Exception:
            return data

    default_box = _MEDIABOX_RE.search(raw)
    pages: list[dict] = []
    for num in sorted(objects):
        body = objects[num][0]
        if not _PAGE_RE.search(body):
            continue
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        refs = [int(cm.group(1))] if cm.group(1) else [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))]
        content = b"".join(content_of(r) for r in refs)
        mb = _MEDIABOX_RE.search(body) or default_box
        if mb:
            x0, y0, x1, y1 = (float(mb.group(i)) for i in range(1, 5))
            width, height = x1 - x0, y1 - y0
        else:
            width, height = 612.0, 792.0
        pages.append({"width": width, "height": height, "runs": positioned_runs(content)})
    return pages


def page_text(page: dict, line_tol: float = 2.0) -> str:
    """All of a page's runs as reading-order text (banner parse input)."""
    runs = sorted((r for r in page["runs"] if r[2].strip()), key=lambda r: (-r[1], r[0]))
    lines: list[str] = []
    prev_y: float | None = None
    for _x, y, s in runs:
        if prev_y is not None and abs(prev_y - y) <= line_tol:
            lines[-1] += " " + s
        else:
            lines.append(s)
        prev_y = y
    return "\n".join(lines)


def runs_to_table(
    runs: list[tuple[float, float, str]],
    top: float,
    height: float,
    col_tol: float = 6.0,
    wrap_gap: float = 13.0,
    line_tol: float = 2.0,
) -> list[list[str | None]]:
    """Positioned runs → row blocks of column-aligned cells.

    - clip to the area ``top`` points below the page's top edge
      (tabula ``area=[top, 0, height, width]`` semantics);
    - columns = gap-clustered x-origins over ALL clipped runs, so the
      header and data share one column map;
    - a line closer than ``wrap_gap`` to its predecessor continues the
      same row block (a wrapped cell); fragments joined with the
      ``.~.`` sentinel — exactly where the reference's tabula output
      carried ``\\r`` (down/down_water_prep.py:666-670).
    """
    area = [(x, y, s) for x, y, s in runs if s.strip() and height - y >= top]
    if not area:
        return []
    area.sort(key=lambda r: (-r[1], r[0]))

    # line grouping by y
    lines: list[tuple[float, list[tuple[float, str]]]] = []
    for x, y, s in area:
        if lines and abs(lines[-1][0] - y) <= line_tol:
            lines[-1][1].append((x, s))
        else:
            lines.append((y, [(x, s)]))

    # column clustering by x gap
    xs = sorted({x for x, _y, _s in area})
    col_starts: list[float] = [xs[0]]
    prev = xs[0]
    for v in xs[1:]:
        if v - prev > col_tol:
            col_starts.append(v)
        prev = v

    def col_of(x: float) -> int:
        return max(0, bisect_right(col_starts, x + col_tol / 2) - 1)

    # block grouping by vertical gap
    blocks: list[list[tuple[float, list[tuple[float, str]]]]] = []
    prev_y: float | None = None
    for y, items in lines:
        if prev_y is None or prev_y - y > wrap_gap:
            blocks.append([])
        blocks[-1].append((y, items))
        prev_y = y

    out: list[list[str | None]] = []
    for blines in blocks:
        cells: list[str | None] = [None] * len(col_starts)
        for _y, items in blines:
            for x, s in items:
                ci = col_of(x)
                cells[ci] = s if cells[ci] is None else cells[ci] + WS_SENTINEL + s
        out.append(cells)
    return out


def _classify(blocks: list[list[str | None]]) -> tuple[list[str] | None, list[list[str | None]]] | None:
    """First-block classification. Returns (header, data_rows), with
    header None for a headerless continuation page — or None overall
    when the first block is a CUT header (retry with a smaller top)."""
    if not blocks:
        return (None, [])
    first = [c.replace(WS_SENTINEL, " ") for c in blocks[0] if c is not None]
    if first and set(first) <= set(SAMPLE_COLUMNS):
        header = [c.replace(WS_SENTINEL, " ") if c is not None else None for c in blocks[0]]
        return (header, blocks[1:])
    if any(c in _HEADER_FRAGMENTS for c in first):
        return None  # cut header — the reference's "'Sample' in headers" signal
    return (None, blocks)


def geometric_pdf_extractor(raw: bytes, top1: float = TOP1, top2: float = TOP2) -> list[dict]:
    """C5b extractor hook for ``read_pdf_tables``: positioned-text table
    recovery with the reference's top=70 → top=45 retry."""
    pages: list[dict] = []
    for i, pg in enumerate(positioned_pages(raw), start=1):
        text = page_text(pg)
        height = pg["height"]
        res = _classify(runs_to_table(pg["runs"], top1, height))
        top_used = top1
        if res is None:
            res = _classify(runs_to_table(pg["runs"], top2, height))
            top_used = top2
        elif res[0] is None and res[1] and len(res[1][0]) in (4, 5):
            # the reference's width rule (down_water_prep.py:839): a
            # headerless 4/5-column page is a right-fragment carryover
            # whose wrapped first column misreads at top=70 — ALWAYS
            # re-extract at top=45 before processing
            res2 = _classify(runs_to_table(pg["runs"], top2, height))
            if res2 is not None:
                res, top_used = res2, top2
        if res is None:
            # the reference stops and asks a human here (:623); we keep
            # the page's blocks as data under the carried header
            warnings.warn(
                f"pdf geom: page {i} header still cut at top={top2}; emitting raw blocks",
                stacklevel=2,
            )
            header, rows = None, runs_to_table(pg["runs"], top2, height)
        else:
            header, rows = res
        pages.append(
            {"page": i, "top_margin": int(top_used), "text": text, "header": header, "rows": rows}
        )
    return pages
