"""Standalone scale probe for the r8 WARC source (sources/warc.py).

Synthesizes gzip'd WARC archives (the CommonCrawl per-record-member
convention) at three scales — 1×, 10×, 100× record count, spread over
FILES at the larger scales because archive files are the source's
parallelism unit — then measures the full scan: read_warc →
html_to_text-sized projection → full-column drain. Each scale block
runs in a fresh child JVM (the bench._spawn_block rationale),
min-of-3 with explicit GC and the contention sentinel.

The scale law to check: throughput (records/sec) should be ~flat or
rising across decades once file parallelism ≥ cores — the per-record
Python walk is linear and embarrassingly parallel across archives;
super-linear wall ratios on a saturated 32-core box are CPU
saturation, not plan growth (SCALING.md's saturation metric:
per-record core-ms must not rise).
"""

from __future__ import annotations

import gc
import gzip
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3
BASE_RECORDS = 2_000  # 1x scale; 10x/100x multiply records AND files

_BODY = (
    b"<html><head><title>t</title></head><body><p>"
    + b"water quality sample result lead copper nitrate value exceeds " * 12
    + b"</p></body></html>"
)


def _record(i: int) -> bytes:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _BODY
    )
    hdrs = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:rec-" + str(i).encode() + b">\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://site-" + str(i % 977).encode()
        + b".example/page/" + str(i).encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return hdrs + payload + b"\r\n\r\n"


def _gen(root: str, n_records: int, n_files: int) -> str:
    path = os.path.join(root, f"warc_{n_records}x{n_files}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    per = n_records // n_files
    for f in range(n_files):
        blob = b"".join(
            gzip.compress(_record(f * per + i)) for i in range(per)
        )
        with open(os.path.join(path, f"seg-{f:05d}.warc.gz"), "wb") as fh:
            fh.write(blob)
    open(done, "w").write("ok")
    return path


def _child(path: str) -> None:
    from bench import _drain, _sentinel_sec
    from waterdata_spark.functions.text import html_to_text, token_count
    from waterdata_spark.session import get_spark
    from waterdata_spark.sources.warc import read_warc

    spark = get_spark("warc-scale-probe")

    def job():
        df = read_warc(spark, path, types=("response",))
        return df.select(
            "target_uri",
            html_to_text("text").alias("text"),
        ).withColumn("n_tok", token_count("text"))

    # page-cache + plan-compile warm, untimed
    _drain(job())
    sent_before = _sentinel_sec()
    runs, n = [], 0
    for _ in range(REPEATS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n = _drain(job())
        runs.append(round(time.monotonic() - t0, 3))
    sent_after = _sentinel_sec()
    drift = round(
        max(sent_before, sent_after) / max(min(sent_before, sent_after), 1e-9), 3
    )
    print(
        json.dumps(
            {
                "sec": min(runs),
                "runs": runs,
                "rows": n,
                "rec_per_sec": round(n / min(runs)),
                "sentinel_drift": drift,
                "contended": drift > 1.15,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return

    root = os.environ.get("WARC_PROBE_DIR", "/tmp/warc_probe")
    scales = [
        ("x1", BASE_RECORDS, 8),
        ("x10", BASE_RECORDS * 10, 32),
        ("x100", BASE_RECORDS * 100, 64),
    ]
    paths = {label: _gen(root, n, files) for label, n, files in scales}
    os.sync()

    out: dict[str, object] = {"metric": "warc_scale_probe"}
    for label, _, _ in scales:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", paths[label]],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3000,
            check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out[label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)
    sec = lambda k: out[k]["sec"]  # noqa: E731
    out["decade1_ratio"] = round(sec("x10") / sec("x1"), 2)
    out["decade2_ratio"] = round(sec("x100") / sec("x10"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
