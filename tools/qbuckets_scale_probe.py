"""Three-decade probe for `selection.quantile_buckets` SAMPLED mode —
the 100 TB path (VERDICT r9 item 7: plan-pinned but never measured
beyond sf-small).

Questions:
1. Does sampled-mode per-row core cost FALL (or hold) across
   sf0.1 → sf1 → sf10 documents (5k/50k/500k docs)? The plan is one
   hash-sample scan → groups×(n_buckets−1) broadcast thresholds →
   CASE chain; nothing in it should be super-linear.
2. Does sampled==exact agreement stay within the documented sampling
   error? Boundary placement error is ~O(1/√(f·|group|)), so the
   DISAGREEMENT FRACTION should FALL as groups grow (fixed fraction f
   → more sample points per group).

Protocol: min-of-N per scale in one JVM (the shaping-probe
convention), GC between repeats, full-column drain. Results recorded
in SCALING.md.
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

REPEATS = int(os.environ.get("QB_PROBE_REPEATS", "4"))
N_BUCKETS = 3
FRACTION = 0.05


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.operators.selection import quantile_buckets
    from waterdata_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        # a deterministic pseudo-perplexity: content-derived, continuous,
        # skewed — the shape a real lm_perplexity column has
        (
            F.length("text").cast("double")
            / (F.size(F.split(F.trim("text"), r"\s+")) + F.lit(1))
            + (F.pmod(F.xxhash64("doc_id"), F.lit(1000)) / 1000.0)
        ).alias("score"),
    )
    n_docs = docs.count()  # warm page cache

    def sampled():
        return quantile_buckets(
            docs,
            "score",
            group_col="lang",
            n_buckets=N_BUCKETS,
            mode="sampled",
            sample_fraction=FRACTION,
        )

    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        df = sampled()
        _drain(df)
        runs.append(round(time.time() - t0, 3))
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    sec = min(runs)
    print(f"# {sf_dir}: sampled {n_docs} docs, min {sec}s of {runs}", file=sys.stderr)

    # agreement vs exact (one evaluation, not timed — exact is the
    # bounded-group oracle path)
    ex = quantile_buckets(
        docs, "score", group_col="lang", n_buckets=N_BUCKETS, mode="exact"
    ).select("doc_id", F.col("bucket").alias("b_exact"))
    sa = sampled().select("doc_id", F.col("bucket").alias("b_sampled"))
    dis = (
        ex.join(sa, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("b_exact") != F.col("b_sampled")).cast("int")).alias("d"),
        )
        .first()
    )
    disagree = int(dis["d"]) / max(int(dis["n"]), 1)
    print(f"# {sf_dir}: disagreement {disagree:.4f}", file=sys.stderr)
    return {
        "docs": n_docs,
        "sec": sec,
        "core_us_per_row": round(1e6 * sec * 32 / max(n_docs, 1), 2),
        "disagree_frac": round(disagree, 5),
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("qbuckets-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "qbuckets_scale_probe", "n_buckets": N_BUCKETS, "fraction": FRACTION}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
