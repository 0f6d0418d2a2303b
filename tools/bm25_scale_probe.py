"""Dedicated-JVM scale probe for BM25 retrieval
(`operators/retrieval.bm25_topk`) — VERDICT r8 item 7: x26 is
oracle-green but the postings build is the same explode-heavy family
as the x08 MinHash pass; measure per-doc core cost across two decades
and the `max_df` cap's effect on the hottest term keys.

Workload: documents at sf0.1 / sf1 / sf10 (the bench replica sets), a
FIXED 512-query batch (6-token slices from every 37th doc with id <
~19k — present at every scale) so the corpus side scales while the
query side stays a serving batch (the x07 profile). Two variants per
scale: uncapped, and max_df = 20% of the corpus (the synthetic
vocabulary is ~31 words, all of them hot — the cap demonstrably
prunes the hottest postings keys). Fresh child JVM per block,
min-of-3, GC between repeats, contention sentinel. Verdict recorded
in SCALING.md."""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# min-of-N; default 6 because this host shows co-tenant contention
# waves (see semdedup_k_probe) — 3 repeats can read 2-4x high
REPEATS = int(os.environ.get("BM25_PROBE_REPEATS", "6"))
QUERY_ID_CAP = 19_000  # %37==3 ids below this exist at every probed scale


def _child(sf_dir: str, partitions: int, max_df_frac: float) -> None:
    from pyspark.sql import functions as F

    from bench import _sentinel_sec
    from waterdata_spark.functions.text import tokens
    from waterdata_spark.operators.retrieval import bm25_topk
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    spark = get_spark("bm25-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = d.count()  # page-cache warm
    toks_raw = tokens(F.col("text"))
    q = (
        d.filter(
            (F.col("doc_id") % 37 == 3)
            & (F.col("doc_id") < QUERY_ID_CAP)
            & (F.size(toks_raw) >= 8)
        )
        .select(
            F.col("doc_id").alias("qid"),
            F.array_join(F.slice(toks_raw, 3, 6), " ").alias("qtext"),
        )
    )
    n_q = q.count()
    max_df = None if max_df_frac <= 0 else int(max_df_frac * n_docs)

    def run() -> int:
        out = bm25_topk(d, q, k=5, max_df=max_df)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64("qid", "doc_id", "rank", "score")).alias("h"),
        ).collect()[0]
        return int(row["n"])

    run()  # plan-compile warm, untimed
    sent_before = _sentinel_sec()
    runs = []
    for _ in range(REPEATS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n_out = run()
        runs.append(round(time.monotonic() - t0, 3))
    sent_after = _sentinel_sec()
    drift = round(
        max(sent_before, sent_after) / max(min(sent_before, sent_after), 1e-9), 3
    )
    print(
        json.dumps(
            {
                "docs": n_docs,
                "queries": n_q,
                "out_rows": n_out,
                "max_df": max_df,
                "sec": min(runs),
                "runs": runs,
                "core_ms_per_doc": round(min(runs) * 32 * 1000 / n_docs, 4),
                "sentinel_drift": drift,
                "contended": drift > 1.15,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]), float(sys.argv[4]))
        return

    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("bm25-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "bm25_scale_probe"}
    for label, sf_dir, parts, frac in [
        ("sf01_uncapped", sf01, 32, 0.0),
        ("sf01_capped", sf01, 32, 0.2),
        ("sf1_uncapped", sf1, 100, 0.0),
        ("sf1_capped", sf1, 100, 0.2),
        ("sf10_uncapped", sf10, 320, 0.0),
        ("sf10_capped", sf10, 320, 0.2),
    ]:
        r = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                sf_dir,
                str(parts),
                str(frac),
            ],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3000,
            check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out[label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)

    def sec(k: str) -> float:
        return out[k]["sec"]  # type: ignore[index,call-overload]

    for variant in ("uncapped", "capped"):
        out[f"{variant}_decade1"] = round(sec(f"sf1_{variant}") / sec(f"sf01_{variant}"), 2)
        out[f"{variant}_decade2"] = round(sec(f"sf10_{variant}") / sec(f"sf1_{variant}"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
