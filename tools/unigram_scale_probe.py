"""Dedicated-JVM scale probe for the unigram-LM tokenizer
(`operators/unigram_lm`) — the at-birth probe. Three corpus decades
(documents at sf0.1/sf1/sf10 — 5k/50k/500k docs), two questions:

1. **train_unigram**: every EM iteration scans the WORD table, so the
   fit cost should track the (vocabulary-bounded, saturating) word
   table, not the corpus — per-doc core cost must FALL steeply with
   corpus scale.
2. **encode_unigram over the full corpus** (the 100 TB pass): one
   Arrow UDF scan with word memoization — per-doc core cost should
   fall/hold across decades (the encode_bpe pattern).

Fresh child JVM per block, min-of-N, GC between repeats, contention
sentinel. Verdict recorded in SCALING.md.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("UNI_PROBE_REPEATS", "5"))
VOCAB = 400


def _child(sf_dir: str, partitions: int) -> None:
    from pyspark.sql import functions as F

    from bench import _sentinel_sec
    from waterdata_spark.operators.unigram_lm import encode_unigram, train_unigram
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    spark = get_spark("unigram-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = d.count()  # page-cache warm

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

    train_runs = timed(
        lambda: train_unigram(d, vocab_size=VOCAB, max_piece_len=4, min_count=2)
    )
    model = train_unigram(d, vocab_size=VOCAB, max_piece_len=4, min_count=2)

    def run_enc():
        out = encode_unigram(d, model)
        return out.agg(
            F.count(F.lit(1)),
            F.max(F.xxhash64(F.col("pieces").cast("string"))),
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
                "vocab": len(model.logp),
                "train_sec": min(train_runs),
                "train_runs": train_runs,
                "train_core_ms_per_doc": round(
                    min(train_runs) * 32 * 1000 / n_docs, 4
                ),
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
    spark = get_spark("unigram-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "unigram_scale_probe", "vocab_size": VOCAB}
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
