"""Benchmark runner (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed as Spark would in production — full plan,
results drained via count on a cached-free plan (no collect of large
results to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from waterdata_spark.queries import QUERIES  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402

# Headline set: the operator families that dominate real workloads —
# wide agg, broadcast join+agg, window dedup, fallback join, inverted-
# index near-dup, LSH ANN (scale path, not the brute-force oracle twin).
HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q06_priority_dedup",
    "q07_topk_orders_per_customer",
    "q14_fallback_join",
    "q17_hourly_rollup",
    "x01_exact_dedup_docs",
    "x06_ngram_jaccard_pairs",
    "q18_asof_join",
    "q19_sessionize",
    "x08_minhash_bands",
    "x07_ivf_topk_bench",
]


def _ivf_bench(spark, sf_dir):
    from waterdata_spark.operators.similarity import cosine_topk_ivf_blocked
    from waterdata_spark.schemas import load_table

    e = load_table(spark, sf_dir, "embeddings")
    # production sizing: n_cells='auto' (√n) keeps cell count and
    # per-cell matmul block growing together across scale factors —
    # measured 7.4s vs 12.6s for fixed 16 cells at sf1
    return cosine_topk_ivf_blocked(e, k=5, n_cells="auto", n_probe=4)


REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))

# sf10 decade (VERDICT r3 task 9): the four queries with the worst
# measured sf0.1→sf1 scale ratios get a second measured decade —
# extrapolation is not evidence, two decades of measurements are.
SCALE_PROBE = [
    "q06_priority_dedup",
    "q07_topk_orders_per_customer",
    "q19_sessionize",
    "x07_ivf_topk_bench",
]


def _run_suite(
    spark, sf_dir: str, names: list[str] | None = None, repeats: int | None = None
) -> tuple[dict[str, float], dict[str, list[float]]]:
    """min-of-N per query (VERDICT r3: a single measurement cannot
    certify the 2x bar — x07's sf1 time doubled on identical code).
    The first repeat also absorbs per-plan first-touch costs (parquet
    footer reads, codegen), so min-of-N is the steady-state number a
    warm cluster would see; the full spread is reported alongside."""
    import gc

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names or HEADLINE:
        fn = _ivf_bench if name == "x07_ivf_topk_bench" else QUERIES[name].fn
        runs: list[float] = []
        for _ in range(max(repeats or REPEATS, 1)):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
            # Measurement hygiene, OUTSIDE the timed window: drop the
            # plan reference and force a driver-side GC so the
            # ContextCleaner releases orphaned blocks (x07's
            # localCheckpoint RDDs otherwise pin executor storage until
            # the 30-min periodic GC — measured: 6 stale checkpoints
            # inflated q06@sf10 from 3.5s to 12.6s in the same JVM).
            del df
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = min(runs)
        spread[name] = runs
        print(f"# {name}: {n} rows, min {min(runs)}s of {runs}", file=sys.stderr)
    return timings, spread


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("waterdata-bench")

    # warm the JVM + parquet footers + Python UDF workers so per-query
    # numbers measure the engine, not first-touch JIT / worker spawn
    QUERIES["q08_distinct_pairs"].fn(spark, sf_dir).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    timings, spread = _run_suite(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": REPEATS,
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # scale-step block (VERDICT r1 item 2): when benching the default
    # sf0.1, also run the suite at sf1 (10x, generated once from sf0.1
    # by tools/scale_testdata.py and cached) and report the per-query
    # scale ratio — the measured evidence that no plan is super-linear
    # across a decade of data. Disable with SPARK_GRAFT_SF1=0.
    if sf == "0.1" and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        from tools.scale_testdata import ensure_scaled

        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
        if ensure_scaled(spark, sf_dir, sf1_dir, factor=10):
            sf1_timings, sf1_spread = _run_suite(spark, sf1_dir)
            out["sf1"] = {
                "value": round(sum(sf1_timings.values()), 3),
                "queries": sf1_timings,
                "spread": sf1_spread,
                "scale_ratio": {
                    k: round(sf1_timings[k] / max(timings[k], 0.05), 2) for k in sf1_timings
                },
            }

            # second measured decade: sf10 on the worst scalers only
            # (3 repeats: the first pass may be COLD I/O — measured 23s
            # vs 5.3s steady for q06 when the host dropped the page
            # cache — so min-of-3 needs two warm passes to be a real
            # steady-state number). Disable: SPARK_GRAFT_SF10=0.
            if os.environ.get("SPARK_GRAFT_SF10", "1") != "0":
                sf10_dir = os.environ.get(
                    "SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10"
                )
                if ensure_scaled(spark, sf1_dir, sf10_dir, factor=10):
                    sf10_t, sf10_s = _run_suite(
                        spark, sf10_dir, names=SCALE_PROBE, repeats=3
                    )
                    out["sf10"] = {
                        "value": round(sum(sf10_t.values()), 3),
                        "queries": sf10_t,
                        "spread": sf10_s,
                        "scale_ratio_vs_sf1": {
                            k: round(sf10_t[k] / max(sf1_timings[k], 0.05), 2)
                            for k in sf10_t
                        },
                    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
