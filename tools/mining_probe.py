"""Scale probe for mine_hard_negatives: exact vs IVF at two decades
of the embeddings table.

Questions:
1. Wall-clock: the exact (quadratic) method's cost grows ~n_q x n_d;
   the IVF method's per-query cost is bounded by the probed cells —
   the crossover should already be visible at 5k -> 50k vectors.
2. Recall of the IVF path at partial probe (the mined set vs exact),
   and at probe-all (must be 1.0 — the equivalence contract).

Protocol: min-of-N in one JVM, GC between repeats. Results ->
SCALING.md.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _drain  # noqa: E402

REPEATS = int(os.environ.get("MINING_PROBE_REPEATS", "3"))
K, LO, HI = 5, 0.1, 0.8
N_CELLS = 16


def _timed(fn) -> float:
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        _drain(fn())
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    return min(runs)


def _recall(exact_rows, got_rows) -> float:
    ex = {}
    for r in exact_rows:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid, s in ex.items():
        tot += len(s)
        hit += len(s & got.get(qid, set()))
    return hit / max(tot, 1)


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.operators.mining import mine_hard_negatives
    from waterdata_spark.operators.similarity import build_ivf_index
    from waterdata_spark.schemas import load_table

    e = load_table(spark, sf_dir, "embeddings")
    data = e.filter(F.col("vec_id") % 5 != 0).persist()
    n_data = data.count()
    queries = (
        e.filter(F.col("vec_id") % 5 == 0)
        .select(F.col("vec_id").alias("qid"), "embedding", "label")
        .persist()
    )
    n_q = queries.count()

    exact_sec = _timed(
        lambda: mine_hard_negatives(
            data, queries, label_col="label", k=K, lo=LO, hi=HI,
            method="exact", max_exact_rows=10**9,  # the probe IS the brute-force baseline
        )
    )
    t0 = time.time()
    idx = build_ivf_index(data, n_cells=N_CELLS)
    idx.indexed.count()
    build_sec = round(time.time() - t0, 3)

    def ivf(n_probe):
        return mine_hard_negatives(
            data,
            queries,
            label_col="label",
            k=K,
            lo=LO,
            hi=HI,
            method="ivf",
            index=idx,
            n_probe=n_probe,
            overfetch=50,
        )

    ivf_sec = _timed(lambda: ivf(4))
    exact_rows = mine_hard_negatives(
        data, queries, label_col="label", k=K, lo=LO, hi=HI,
        method="exact", max_exact_rows=10**9,
    ).collect()
    rec_partial = _recall(exact_rows, ivf(4).collect())
    rec_all = _recall(exact_rows, ivf(N_CELLS).collect())
    data.unpersist()
    queries.unpersist()
    return {
        "n_data": n_data,
        "n_queries": n_q,
        "exact_sec": exact_sec,
        "ivf_build_sec": build_sec,
        "ivf_serve_sec": ivf_sec,
        "recall_probe4": round(rec_partial, 4),
        "recall_probe_all": round(rec_all, 4),
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    spark = get_spark("mining-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "mining_probe", "k": K, "lo": LO, "hi": HI, "n_cells": N_CELLS}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
