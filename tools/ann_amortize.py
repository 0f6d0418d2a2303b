"""Amortized ANN serving measurement: build_ivf_index ONCE, then
per-batch search_ivf_index, vs the one-shot cosine_search_ivf that
rebuilds per call — the evidence for the FAISS-style build/search
split (the production serving shape: daily index build, continuous
query batches).

Usage: python tools/ann_amortize.py [sf_dir]

One-off evidence tool (results recorded in SCALING.md).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 3


def main() -> None:
    from waterdata_spark.operators.similarity import (
        build_ivf_index,
        cosine_search_ivf,
        search_ivf_index,
    )
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-amortize")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    e = load_table(spark, sf_dir, "embeddings")
    data = e.filter(F.col("vec_id") % 10 != 0)
    batches = [
        e.filter(F.col("vec_id") % 10 == b).withColumnRenamed("vec_id", "qid")
        for b in range(N_BATCHES)
    ]

    def clean():
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # one-shot path: every batch pays the full build
    oneshot = []
    for q in batches:
        t0 = time.time()
        cosine_search_ivf(data, q, query_id_col="qid", k=5, n_cells="auto", n_probe=4).count()
        oneshot.append(round(time.time() - t0, 3))
        clean()

    # split path: build once (materialized via a count), then per-batch search
    t0 = time.time()
    index = build_ivf_index(data, n_cells="auto")
    index.indexed.count()
    build_s = round(time.time() - t0, 3)
    per_batch = []
    for q in batches:
        t0 = time.time()
        search_ivf_index(index, q, query_id_col="qid", k=5, n_probe=4).count()
        per_batch.append(round(time.time() - t0, 3))
        clean()

    print(
        json.dumps(
            {
                "metric": "ann_amortization",
                "sf_dir": sf_dir,
                "oneshot_per_batch": oneshot,
                "build_once_sec": build_s,
                "search_per_batch": per_batch,
                "amortized_speedup_steady": round(
                    min(oneshot) / max(min(per_batch), 1e-3), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
