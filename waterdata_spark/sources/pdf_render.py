"""DWRS-layout PDF synthesis — the test-fixture half of C5b.

The reference repo ships the EXTRACTED output of its yearly DWRS PDFs
(down/rptinfo*.csv, with full per-row provenance: MAIN_PAGE,
TOP_MARGIN, SPLIT_PAGES, SYSNAME_PAGE) but not the PDFs themselves.
This module inverts that: it renders a DWRS-layout PDF from fixture
rows, reproducing the geometry the reference's notes describe
(down/down_water_prep.py:30-46,169-171,568-660):

- landscape 792x612 pages, one banner line per page
  (``***  PWSID = n | SYSTEM NAME = s*** p``, per-system ordinal);
- a 10-column samples table below a 70pt top margin; TOP_MARGIN=45
  pages render the header as two wrapped lines straddling the 70pt
  cut so extraction at top=70 sees only fragments and must retry;
- SPLIT_PAGES=2 tables span a left page (first 6 columns) and a
  right page (last 4), with optional headerless left-carryover pages
  between them (the reference's 6/7-field case, :777-812);
- pages that contributed no fixture rows become banner+header-only
  pages (zero data rows).

``geometric_pdf_extractor`` + ``stitch_pages`` over the rendered PDF
must reproduce the fixture row-for-row — that is the C5b parity gate
(tests/test_pdf_geom.py).
"""

from __future__ import annotations

import zlib

from waterdata_spark.sources.pdf_table import SAMPLE_COLUMNS

PAGE_W, PAGE_H = 792.0, 612.0
BANNER_TD = 22.0  # distance from top edge — above both top margins
HEADER_TD = 80.0  # single-line header position (TOP_MARGIN=70 pages)
HEADER45_TD = (60.0, 72.0)  # wrapped header lines straddling the 70pt cut
DATA_TD = 100.0
ROW_PITCH = 18.0
COL_X = [8.0 + 78.0 * i for i in range(10)]
LEFT_COLS = SAMPLE_COLUMNS[:6]
RIGHT_COLS = SAMPLE_COLUMNS[6:]

# two-line form of each column name for TOP_MARGIN=45 pages: line 1
# sits above the 70pt cut, line 2 below it
_HEADER_WRAP = {
    "Sample Location": ("Sample", "Location"),
    "Contaminant ID": ("Contaminant", "ID"),
    "Analysis Result": ("Analysis", "Result"),
    "MCL In Effect": ("MCL In", "Effect"),
    "Sample Date": ("Sample", "Date"),
    "Sample Type": ("Sample", "Type"),
    "Laboratory ID": ("Laboratory", "ID"),
    "Analysis Method": ("Analysis", "Method"),
    "Analysis Date": ("Analysis", "Date"),
    "Sample Received Date": ("Sample Received", "Date"),
}


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def render_pdf(pages: list[list[tuple[float, float, str]]]) -> bytes:
    """Minimal PDF writer: each page is a list of (x, top_distance,
    text) runs, drawn with Tm-positioned Helvetica Tj ops in
    FlateDecode content streams."""
    objs: list[bytes] = []  # 1-indexed

    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, runs in enumerate(pages):
        page_id = 3 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} {PAGE_H:g}] "
                f"/Contents {page_id + 1} 0 R /Resources << /Font << /F1 {font_id} 0 R >> >> >>"
            ).encode()
        )
        parts = ["BT /F1 8 Tf"]
        for x, td, text in runs:
            y = PAGE_H - td
            parts.append(f"1 0 0 1 {x:g} {y:g} Tm ({_esc(text)}) Tj")
        parts.append("ET")
        stream = zlib.compress("\n".join(parts).encode("latin-1"))
        objs.append(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n"
            + stream
            + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _banner_run(pwsid: str, system_name: str, snp: int) -> tuple[float, float, str]:
    # system_name carries the reference's leading space (fixture form);
    # parse_banner_ref reproduces it from the ' | ' separator
    return (COL_X[0], BANNER_TD, f"***  PWSID = {pwsid} | SYSTEM NAME ={system_name}*** {snp}")


def _header_runs(cols: list[str], top_margin: int) -> list[tuple[float, float, str]]:
    runs = []
    for i, name in enumerate(cols):
        x = COL_X[i]
        if top_margin == 45:
            l1, l2 = _HEADER_WRAP[name]
            runs.append((x, HEADER45_TD[0], l1))
            runs.append((x, HEADER45_TD[1], l2))
        else:
            runs.append((x, HEADER_TD, name))
    return runs


def _data_runs(rows: list[list[str | None]], cols_x: list[float]) -> list[tuple[float, float, str]]:
    runs = []
    for r, row in enumerate(rows):
        td = DATA_TD + ROW_PITCH * r
        for c, cell in enumerate(row):
            if cell is not None and str(cell) != "":
                runs.append((cols_x[c], td, str(cell)))
    return runs


def dwrs_pages_from_fixture(records: list[dict]) -> list[list[tuple[float, float, str]]]:
    """Fixture rows (rptinfo*.csv dicts, strings, None for NaN) → PDF
    page run-lists whose extraction reproduces the records exactly.

    Consecutive rows sharing MAIN_PAGE form a table group; groups are
    laid out on the physical pages their provenance names:

    - SPLIT_PAGES=1 at page p → one full-width page p;
    - SPLIT_PAGES=2 at page p → left page p + right page (after any
      carryover pages). A following group at p+1 with SPLIT_PAGES=2
      and the same PWSID is a headerless left-carryover page;
    - physical pages never named by any row (tables with no samples)
      are rendered as banner + header only.
    """
    # group consecutive rows by MAIN_PAGE
    groups: list[dict] = []
    for rec in records:
        mp = int(rec["MAIN_PAGE"])
        if not groups or groups[-1]["page"] != mp:
            groups.append(
                {
                    "page": mp,
                    "split": int(rec["SPLIT_PAGES"]),
                    "tm": int(rec["TOP_MARGIN"]),
                    "pwsid": rec["PWSID"],
                    "sn": rec["SYSTEM NAME"],
                    "snp": int(rec["SYSNAME_PAGE"]),
                    "rows": [],
                    "row_tms": [],
                }
            )
        groups[-1]["rows"].append([rec.get(c) for c in SAMPLE_COLUMNS])
        groups[-1]["row_tms"].append(int(rec["TOP_MARGIN"]))

    pages: dict[int, list[tuple[float, float, str]]] = {}

    def left_vals(row):
        return row[: len(LEFT_COLS)]

    def right_vals(row):
        return row[len(LEFT_COLS) :]

    i = 0
    while i < len(groups):
        g = groups[i]
        p = g["page"]
        banner = _banner_run(g["pwsid"], g["sn"], g["snp"])
        if g["split"] == 1:
            pages[p] = [banner] + _header_runs(SAMPLE_COLUMNS, g["tm"]) + _data_runs(
                g["rows"], COL_X
            )
            i += 1
            continue
        # split table: left page p, then any carryover groups, then the
        # right page holding the right halves of ALL the rows
        all_rows = list(g["rows"])
        pages[p] = [banner] + _header_runs(LEFT_COLS, g["tm"]) + _data_runs(
            [left_vals(r) for r in g["rows"]], COL_X
        )
        next_p = p + 1
        j = i + 1
        while (
            j < len(groups)
            and groups[j]["page"] == next_p
            and groups[j]["split"] == 2
            and groups[j]["pwsid"] == g["pwsid"]
        ):
            co = groups[j]
            pages[next_p] = [_banner_run(co["pwsid"], co["sn"], co["snp"])] + _data_runs(
                [left_vals(r) for r in co["rows"]], COL_X
            )
            all_rows.extend(co["rows"])
            next_p += 1
            j += 1
        pages[next_p] = [
            _banner_run(g["pwsid"], g["sn"], g["snp"] + (next_p - p))
        ] + _header_runs(RIGHT_COLS, 70) + _data_runs(
            [right_vals(r) for r in all_rows], COL_X
        )
        # right-fragment carryover (the reference's 4/5-field patch
        # case, down_water_prep.py:839-931): trailing rows whose
        # TOP_MARGIN differs from the group's were re-read from a
        # headerless 5-field continuation page (Sample Type + the
        # right columns) and patched in place — render that page after
        # the right page
        tail_k = 0
        for t in reversed(g["row_tms"]):
            if t != g["tm"]:
                tail_k += 1
            else:
                break
        if tail_k:
            co_rows = [[r[5]] + right_vals(r) for r in g["rows"][-tail_k:]]
            next_p += 1
            pages[next_p] = [
                _banner_run(g["pwsid"], g["sn"], g["snp"] + (next_p - p))
            ] + _data_runs(co_rows, COL_X)
        i = j

    # fill physical pages with no contributing rows: banner + header only
    if pages:
        all_ps = sorted(pages)
        by_page = {g["page"]: g for g in groups}
        for p in range(all_ps[0], all_ps[-1] + 1):
            if p not in pages:
                nxt = next((by_page[q] for q in range(p + 1, all_ps[-1] + 2) if q in by_page), None)
                pw = nxt["pwsid"] if nxt else "0"
                sn = nxt["sn"] if nxt else " NONE"
                snp = max((nxt["snp"] - 1) if nxt else 1, 1)
                pages[p] = [_banner_run(pw, sn, snp)] + _header_runs(SAMPLE_COLUMNS, 70)
    return [pages[p] for p in sorted(pages)]


def render_dwrs_pdf(records: list[dict]) -> bytes:
    """Fixture records → DWRS-layout PDF bytes (the C5b parity input)."""
    return render_pdf(dwrs_pages_from_fixture(records))
