"""Measure what int8 index quantization (operators/quantize.py) buys
and costs on the real embeddings table:

- SIZE: the persisted IVF data side written as parquet, float64 unit
  vectors vs int8+scale — the bytes a 100 TB corpus stores and every
  search shuffle moves;
- RECALL: quantized asymmetric search vs the exact brute-force top-k,
  at the documented >=0.9-recall operating point (cells=16, probe=8,
  n_assign=2) — side by side with the unquantized index's recall so
  the quantization penalty is isolated;
- TIME: min-of-3 steady-state search time over the prebuilt index,
  quantized vs not.

Prints one JSON line; results recorded in SCALING.md.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from waterdata_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    cosine_topk_bruteforce,
    search_ivf_index,
)
from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _recall(result_df, truth: dict[int, set], k: int) -> float:
    got: dict[int, set] = {}
    for r in result_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return round(hits / (len(truth) * k), 4)


def _timed_search(index, queries, k, n_probe, repeats=3) -> float:
    best = float("inf")
    for _ in range(repeats):
        gc.collect()
        t0 = time.monotonic()
        search_ivf_index(index, queries, k=k, n_probe=n_probe, sim_col=None).count()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("quantize-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k, n_cells, n_probe, n_assign = 5, 16, 8, 2
    e = load_table(spark, sf_dir, "embeddings")

    # ground truth: exact self-top-k (excluding self-match handled by
    # bruteforce itself) on a deterministic 500-query subset
    queries = e.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk_bruteforce(
        queries.unionByName(e.filter(F.col("vec_id") % 20 != 0)), k=k, sim_col=None
    )
    truth: dict[int, set] = {}
    qids = {r["vec_id"] for r in queries.select("vec_id").collect()}
    for r in exact.filter(F.col("vec_id").isin(list(qids))).collect():
        truth.setdefault(r["vec_id"], set()).add(r["neighbor_id"])

    out: dict = {"sf_dir": sf_dir, "k": k, "n_cells": n_cells, "n_probe": n_probe, "n_assign": n_assign}
    for tag, quant in (("fp64", False), ("int8", True)):
        idx = build_ivf_index(e, n_cells=n_cells, n_assign=n_assign, quantize=quant)
        idx.indexed.count()
        path = f"/tmp/quantize_probe_{tag}"
        idx.indexed.write.mode("overwrite").parquet(path)
        out[f"{tag}_index_bytes"] = _dir_bytes(path)
        res = search_ivf_index(idx, e, k=k + 1, n_probe=n_probe, sim_col=None).filter(
            (F.col("query_id") != F.col("neighbor_id")) & F.col("query_id").isin(list(qids))
        )
        # k+1 then drop self-match, re-rank to k
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy("rank")
        res = res.withColumn("r2", F.row_number().over(w)).filter(F.col("r2") <= k)
        out[f"{tag}_recall"] = _recall(res, truth, k)
        out[f"{tag}_search_sec"] = _timed_search(idx, e, k, n_probe)
        idx.indexed.unpersist()

    out["size_ratio"] = round(out["fp64_index_bytes"] / out["int8_index_bytes"], 2)
    out["recall_delta"] = round(out["fp64_recall"] - out["int8_recall"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
