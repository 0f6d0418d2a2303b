"""Dedicated-JVM scale probe for the BPE tokenizer pipeline
(`operators/bpe`) — the at-birth probe the r5-r8 verdicts made
standard for new operators. Three questions, three corpus decades
(documents at sf0.1/sf1/sf10 — 5k/50k/500k docs):

1. **word_counts** (the distributed part): one explode + map-side-
   combining groupBy, output vocabulary-bounded — per-doc core cost
   should FALL with scale like every other linear pass.
2. **train_bpe merge loop** (driver-side on the collected frequency
   dict): cost is a function of |vocab| and n_merges, NOT corpus size
   — reported to show it stays bounded as the corpus grows.
3. **encode_bpe** (Arrow UDF scan, merge ranks in the closure,
   per-batch word memoization): per-doc cost should fall/hold across
   decades; Zipf memoization makes the common word a dict hit.

Fresh child JVM per block, min-of-N (6 — this host's co-tenant
contention waves), GC between repeats, contention sentinel. Verdict
recorded in SCALING.md.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("BPE_PROBE_REPEATS", "6"))
N_MERGES = 200


def _child(sf_dir: str, partitions: int) -> None:
    from pyspark.sql import functions as F

    from bench import _sentinel_sec
    from waterdata_spark.operators.bpe import (
        encode_bpe,
        train_bpe_merges,
        word_counts,
    )
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    spark = get_spark("bpe-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = d.count()  # page-cache warm

    def run_wc() -> tuple[int, list]:
        wc = word_counts(d, "text", min_count=2)
        row = wc.agg(
            F.count(F.lit(1)).alias("v"), F.max(F.xxhash64("word", "count")).alias("h")
        ).collect()[0]
        return int(row["v"]), wc

    def timed(fn):
        fn()  # plan-compile warm, untimed
        runs = []
        for _ in range(REPEATS):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        return runs

    sent_before = _sentinel_sec()

    vocab_size, _ = run_wc()
    wc_runs = timed(lambda: run_wc())

    # driver merge loop: collected once (vocabulary-bounded), timed alone
    counts = {
        r["word"]: r["count"] for r in word_counts(d, "text", min_count=2).collect()
    }
    t0 = time.monotonic()
    merges = train_bpe_merges(counts, N_MERGES)
    merge_sec = round(time.monotonic() - t0, 3)

    from waterdata_spark.operators.bpe import BPEModel

    model = BPEModel(merges=merges)

    def run_enc():
        out = encode_bpe(d, model)
        return out.agg(
            F.count(F.lit(1)),
            F.max(F.xxhash64(F.col("bpe").cast("array<string>").cast("string"))),
        ).collect()

    enc_runs = timed(run_enc)

    sent_after = _sentinel_sec()
    drift = round(
        max(sent_before, sent_after) / max(min(sent_before, sent_after), 1e-9), 3
    )
    print(
        json.dumps(
            {
                "docs": n_docs,
                "vocab_min2": vocab_size,
                "n_merges": len(merges),
                "wc_sec": min(wc_runs),
                "wc_runs": wc_runs,
                "wc_core_ms_per_doc": round(min(wc_runs) * 32 * 1000 / n_docs, 4),
                "merge_loop_sec": merge_sec,
                "enc_sec": min(enc_runs),
                "enc_runs": enc_runs,
                "enc_core_ms_per_doc": round(min(enc_runs) * 32 * 1000 / n_docs, 4),
                "sentinel_drift": drift,
                "contended": drift > 1.15,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]))
        return

    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("bpe-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "bpe_scale_probe", "n_merges": N_MERGES}
    for label, sf_dir, parts in [
        ("sf01", sf01, 32),
        ("sf1", sf1, 100),
        ("sf10", sf10, 320),
    ]:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir, str(parts)],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3600,
            check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out[label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
