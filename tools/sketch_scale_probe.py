"""Three-decade probe for the mergeable sketches (operators/sketches):

1. HLL profile + CMS build cost per row — both are single
   map-side-combinable aggregates, so per-row core cost must FALL (or
   hold) across sf0.1 → sf1 → sf10 documents (5k/50k/500k docs; the
   token stream is the real row count — ~100x the doc count).
2. The incremental-update claim, measured: updating a stored profile
   with one new decade of data via MERGE (sketch the new shard, union
   with the stored sketch) vs RESCAN (re-sketch old+new together).
   Merge cost must stay ~the new shard's sketch cost, so the
   advantage widens with the stored corpus.
3. Estimate quality at scale: CMS overestimate fraction at the
   documented eps*N bound; HLL relative error vs exact distinct.

Protocol: min-of-N per scale in one JVM (the shaping-probe
convention), GC between repeats, full drain. Results -> SCALING.md.
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

REPEATS = int(os.environ.get("SKETCH_PROBE_REPEATS", "4"))
DEPTH, WIDTH = 4, 8192
LG_K = 12


def _timed(fn) -> float:
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        _drain(fn())
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    return min(runs)


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.operators.bpe import word_counts
    from waterdata_spark.operators.sketches import (
        count_min_build,
        count_min_lookup,
        count_min_merge,
        estimate_hll_profile,
        hll_profile,
        merge_hll_profiles,
    )
    from waterdata_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    n_docs = docs.count()  # warm page cache
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    n_toks = toks.count()

    hll_sec = _timed(lambda: hll_profile(docs, ["lang", "source", "doc_id"], LG_K))
    cms_sec = _timed(lambda: count_min_build(toks, "w", DEPTH, WIDTH))

    # incremental update vs rescan: "stored" = docs, "new shard" = a
    # 10% hash-slice re-keyed as fresh rows
    stored = count_min_build(toks, "w", DEPTH, WIDTH).persist()
    stored.count()
    shard = toks.filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)
    merge_sec = _timed(
        lambda: count_min_merge(stored, count_min_build(shard, "w", DEPTH, WIDTH))
    )
    rescan_sec = _timed(
        lambda: count_min_build(toks.unionByName(shard), "w", DEPTH, WIDTH)
    )
    stored.unpersist()

    # estimate quality
    wc = word_counts(docs, "text")
    cms = count_min_build(wc, "word", DEPTH, WIDTH, weight_col="count")
    est = count_min_lookup(cms, wc.select("word"), "word", DEPTH, WIDTH)
    q = (
        est.join(wc, "word")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("est") < F.col("count")).cast("int")).alias("under"),
            F.sum((F.col("est") > F.col("count")).cast("int")).alias("over"),
            F.max(F.col("est") - F.col("count")).alias("max_overshoot"),
        )
        .first()
    )
    exact_lang = docs.agg(F.countDistinct("doc_id")).first()[0]
    hll_est = {
        r["column"]: r["distinct_est"]
        for r in estimate_hll_profile(
            merge_hll_profiles(hll_profile(docs, ["doc_id"], LG_K))
        ).collect()
    }["doc_id"]

    return {
        "docs": n_docs,
        "tokens": n_toks,
        "hll_profile_sec": hll_sec,
        "cms_build_sec": cms_sec,
        "cms_core_us_per_token": round(1e6 * cms_sec * 32 / max(n_toks, 1), 3),
        "merge_update_sec": merge_sec,
        "rescan_sec": rescan_sec,
        "merge_advantage": round(rescan_sec / max(merge_sec, 1e-9), 2),
        "cms_under": int(q["under"]),
        "cms_over_frac": round(int(q["over"]) / max(int(q["n"]), 1), 4),
        "cms_max_overshoot": int(q["max_overshoot"]),
        "eps_n_bound": round(math.e / WIDTH * n_toks, 1),
        "hll_docid_rel_err": round(abs(hll_est - exact_lang) / max(exact_lang, 1), 4),
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("sketch-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "sketch_scale_probe", "depth": DEPTH, "width": WIDTH, "lg_k": LG_K}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
