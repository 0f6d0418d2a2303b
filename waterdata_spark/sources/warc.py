"""WARC / WET web-archive source (beyond the reference contract).

The reference ingests curated CSV/Excel/PDF extracts; a 100 TB
training-data pipeline starts one step earlier, at the crawl archive.
WARC (ISO 28500 — the public CommonCrawl container) is a stream of
records::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: http://example.com/\r\n
    Content-Length: 1234\r\n
    \r\n
    <payload: exactly Content-Length bytes>
    \r\n\r\n

``.warc.gz`` files are CONCATENATED gzip members (one per record, so
archives are seekable); stdlib zlib handles that with a decompressobj
loop — no external libs.

Scale shape: parallelism is ACROSS ARCHIVE FILES — the unit every
public WARC pipeline uses (CommonCrawl ships ~1 GB segments, tens of
thousands per crawl). ``binaryFile`` gives one row per archive (a
whole-file read — the format is why: records span arbitrary byte
ranges, and per-record gzip members only split cheaply once the
member boundaries are walked); splitting into records is a narrow
``mapInPandas`` with bounded output batches, so record rows stream to
downstream operators without the file list ever hitting the driver.
Payload bytes never shuffle unless the caller asks them to.

Downstream this feeds the existing crawl stack: ``functions/urls``
(frontier dedup keys), ``functions/text.html_to_text`` (WET-style
extraction), lang-ID/quality gates, then the dedup cascade.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "source_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, truncated boolean, payload binary, text string"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a possibly multi-member gzip stream (the .warc.gz
    convention: one member per record). Plain bytes pass through."""
    if not data.startswith(_GZIP_MAGIC):
        return data
    out = []
    rest = data
    while rest.startswith(_GZIP_MAGIC):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    return b"".join(out)


def split_warc_records(
    data: bytes, max_payload_bytes: int | None = None
) -> Iterator[tuple[dict, bytes, bool]]:
    """Walk one (decompressed) WARC byte stream; yield
    ``(headers, payload, truncated)`` per record.

    Pure function of the bytes — unit-testable without Spark, and the
    exact code the executor runs. Header names are lower-cased;
    ``Content-Length`` drives the payload slice (the spec's framing —
    payloads may contain blank lines, so scanning for separators would
    corrupt). Records with a malformed version line or missing
    Content-Length are skipped, not fatal: a 100 TB crawl ALWAYS
    contains damaged segments, and one bad record must not kill the
    archive's task."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs (two after each record per spec;
        # tolerate any run of newline bytes)
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        if hdr_end == -1:
            hdr_end = data.find(b"\n\n", pos)  # tolerant: bare-LF writers
            sep = 2
        if hdr_end == -1:
            return
        block = data[pos:hdr_end].decode("utf-8", errors="replace")
        lines = block.replace("\r\n", "\n").split("\n")
        if not lines or not lines[0].startswith("WARC/"):
            # not a record boundary — resync at the next version line
            nxt = data.find(b"WARC/", hdr_end)
            if nxt == -1:
                return
            pos = nxt
            continue
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            nxt = data.find(b"WARC/", hdr_end)
            if nxt == -1:
                return
            pos = nxt
            continue
        body_start = hdr_end + sep
        payload = data[body_start : body_start + length]
        truncated = len(payload) < length
        if max_payload_bytes is not None and len(payload) > max_payload_bytes:
            payload, truncated = payload[:max_payload_bytes], True
        yield headers, payload, truncated
        pos = body_start + length


def _strip_http_headers(payload: bytes, content_type: str) -> bytes:
    """response-record payloads are full HTTP messages
    (``Content-Type: application/http``); the body starts after the
    first blank line. Non-HTTP payloads pass through untouched."""
    if "application/http" not in content_type:
        return payload
    for sep in (b"\r\n\r\n", b"\n\n"):
        i = payload.find(sep)
        if i != -1:
            return payload[i + len(sep) :]
    return payload


def read_warc(
    spark: SparkSession,
    path: str | list[str],
    types: Iterable[str] | None = ("response", "conversion"),
    strip_http: bool = True,
    decode_text: bool = True,
    max_payload_bytes: int | None = 16 * 1024 * 1024,
    records_per_batch: int = 256,
) -> DataFrame:
    """Read WARC/WET archives into one row per record.

    - ``types``: keep only these WARC-Types (default: ``response`` —
      raw WARC fetches — and ``conversion`` — WET extracted text);
      ``None`` keeps everything (request/metadata/warcinfo included).
    - ``strip_http``: drop the HTTP envelope from response payloads so
      ``payload`` is the document body.
    - ``decode_text``: also emit ``text`` (UTF-8, errors replaced) —
      the hand-off column for html_to_text / lang-ID / dedup.
    - ``max_payload_bytes``: per-record cap (flagged in ``truncated``)
      so one pathological record cannot blow an executor; 16 MB
      default ≈ CommonCrawl's own truncation policy.
    """
    import pandas as pd  # Arrow-batched executor path only

    keep = None if types is None else {t.lower() for t in types}

    def emit(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [
            "source_file", "record_id", "warc_type", "target_uri",
            "warc_date", "content_type", "content_length", "truncated",
            "payload", "text",
        ]
        rows: list[tuple] = []
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = _gunzip_members(bytes(blob))
                for hdr, payload, trunc in split_warc_records(
                    data, max_payload_bytes
                ):
                    wtype = hdr.get("warc-type", "")
                    if keep is not None and wtype.lower() not in keep:
                        continue
                    ctype = hdr.get("content-type", "")
                    if strip_http:
                        payload = _strip_http_headers(payload, ctype)
                    rows.append((
                        fpath,
                        hdr.get("warc-record-id"),
                        wtype,
                        hdr.get("warc-target-uri"),
                        hdr.get("warc-date"),
                        ctype,
                        len(payload),
                        trunc,
                        payload,
                        payload.decode("utf-8", errors="replace")
                        if decode_text
                        else None,
                    ))
                    if len(rows) >= records_per_batch:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(emit, schema=WARC_SCHEMA)


def read_wet(spark: SparkSession, path: str | list[str], **kw) -> DataFrame:
    """WET convenience: conversion records only, text out — the
    ``(target_uri, text)`` frame the hygiene/dedup stack consumes."""
    kw.setdefault("types", ("conversion",))
    kw.setdefault("strip_http", False)  # WET payloads are already bare text
    df = read_warc(spark, path, **kw)
    return df.select(
        "source_file", "record_id", "target_uri", "warc_date",
        "content_length", "truncated", "text",
    ).filter(F.col("text").isNotNull())
