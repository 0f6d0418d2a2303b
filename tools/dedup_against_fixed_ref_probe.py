"""The isolating experiment VERDICT r7 item 1 asked for: does
dedup_against scale super-linearly because of the PLAN, or because the
probe workload grew BOTH corpora 10x (which grows the near-threshold
candidate-pair mass ~100x)?

Production shape: the reference (already-ingested corpus) is FROZEN;
only the incoming crawl grows. Hold the reference fixed — the 10%
slice of the sf0.1 documents the r7 probes used — and scale ONLY the
corpus 10x and 100x. If the super-linear term was the both-sides pair
mass, the fixed-reference decade ratios should read ~linear (pair mass
grows ~10x with the corpus); if the plan itself were super-linear, the
ratios would stay >2x even here.

Method: the x08 probe protocol — each (corpus scale, partitions)
block in a FRESH child JVM, min-of-3 with the full-column drain and
explicit GC, input repartitioned (single-parquet-file layout guard),
bench partition sizing per corpus scale (32 / 100 / 320).

Prints one JSON line; SCALING.md records the verdict.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3
REF_SF_ENV = "SPARK_GRAFT_SF_DIR"  # the reference always comes from sf0.1


def _frames(spark, corpus_dir: str, ref_dir: str):
    from pyspark.sql import functions as F

    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import default_parallelism

    corpus = (
        load_table(spark, corpus_dir, "documents")
        .select("doc_id", "text")
        .repartition(default_parallelism())
    )
    # the FROZEN reference: same construction as the r7 probes (10%
    # slice, ids offset out of the corpus key space) but always from
    # the BASE sf0.1 table, regardless of corpus scale
    ref = (
        load_table(spark, ref_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 10**7).alias("doc_id"), "text")
    )
    return corpus, ref


def _child(corpus_dir: str, ref_dir: str, partitions: int) -> None:
    from bench import _drain, _sentinel_sec
    from waterdata_spark.operators.dedup_approx import dedup_against
    from waterdata_spark.session import get_spark

    spark = get_spark("dedup-against-fixed-ref-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    corpus, ref = _frames(spark, corpus_dir, ref_dir)
    corpus.count(), ref.count()  # page-cache warm
    _drain(dedup_against(corpus, ref))  # plan-compile warm, untimed
    sent_before = _sentinel_sec()
    runs = []
    for _ in range(REPEATS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n = _drain(dedup_against(corpus, ref))
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
                "sentinel_drift": drift,
                "contended": drift > 1.15,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return

    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get(REF_SF_ENV, "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("fixed-ref-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "dedup_against_fixed_ref_probe"}
    for label, corpus_dir, parts in [
        ("corpus_sf01_p32", sf01, 32),
        ("corpus_sf1_p100", sf1, 100),
        ("corpus_sf10_p320", sf10, 320),
    ]:
        r = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                corpus_dir,
                sf01,
                str(parts),
            ],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3600,
            check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out[label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)
    sec = lambda k: out[k]["sec"]  # noqa: E731
    out["decade1_ratio"] = round(sec("corpus_sf1_p100") / sec("corpus_sf01_p32"), 2)
    out["decade2_ratio"] = round(sec("corpus_sf10_p320") / sec("corpus_sf1_p100"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
