"""Three-decade probe for pack_sequences_bfd vs pack_sequences:

1. Cost: BFD is one Arrow per-stream pass after the same stream
   exchange the cumsum packer uses — per-doc core cost must fall (or
   hold) with scale, and the premium over the pure-window cumsum form
   should be a bounded constant factor (the price of
   capacity-respecting bins).
2. Quality, both directions of the trade:
   - BFD: zero bins over budget; bins used vs the ceil(total/budget)
     lower bound (the 11/9 guarantee should be loose in practice).
   - cumsum: minimum bin count, but the overflow fraction and mean
     overshoot show what BFD buys.

Protocol: min-of-N per scale in one JVM, GC between repeats, full
drain. Results -> SCALING.md.
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _drain  # noqa: E402

REPEATS = int(os.environ.get("BFD_PROBE_REPEATS", "4"))
BUDGET = 512
STREAMS = 256


def _timed(fn) -> float:
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        _drain(fn())
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    return min(runs)


def _quality(packed, budget: int) -> dict:
    bins = packed.groupBy("stream_id", "bin_id").agg(
        F.sum("n_tokens").alias("tot")
    )
    q = bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum((F.col("tot") > budget).cast("int")).alias("over_bins"),
        F.avg(
            F.when(F.col("tot") > budget, F.col("tot") - budget).otherwise(0)
        ).alias("mean_overshoot"),
        F.sum("tot").alias("total_tokens"),
    ).first()
    lower = math.ceil(int(q["total_tokens"]) / budget)
    return {
        "n_bins": int(q["n_bins"]),
        "bins_vs_lower_bound": round(int(q["n_bins"]) / max(lower, 1), 4),
        "overflow_bin_frac": round(int(q["over_bins"]) / max(int(q["n_bins"]), 1), 4),
        "mean_overshoot_tokens": round(float(q["mean_overshoot"]), 2),
    }


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.operators.chunking import pack_sequences, pack_sequences_bfd
    from waterdata_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # warm page cache

    cum_sec = _timed(
        lambda: pack_sequences(docs, budget_tokens=BUDGET, n_streams=STREAMS)
    )
    bfd_sec = _timed(
        lambda: pack_sequences_bfd(docs, budget_tokens=BUDGET, n_streams=STREAMS)
    )
    cum_q = _quality(
        pack_sequences(docs, budget_tokens=BUDGET, n_streams=STREAMS), BUDGET
    )
    bfd_q = _quality(
        pack_sequences_bfd(docs, budget_tokens=BUDGET, n_streams=STREAMS), BUDGET
    )
    return {
        "docs": n_docs,
        "cumsum_sec": cum_sec,
        "bfd_sec": bfd_sec,
        "bfd_premium": round(bfd_sec / max(cum_sec, 1e-9), 2),
        "bfd_core_us_per_doc": round(1e6 * bfd_sec * 32 / max(n_docs, 1), 2),
        "cumsum": cum_q,
        "bfd": bfd_q,
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("bfd-pack-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "bfd_pack_probe", "budget": BUDGET, "streams": STREAMS}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
