"""Fresh-JVM interleaved A/B for q06@sf10 (VERDICT r12 items 1 and 3).

Round 12 left one disputed number: the builder's same-JVM interleaved
A/B measured `windowGroupLimitThreshold=-1` ("off") winning q06@sf10
6/6 (11.35s -> 7.58s), while the driver's fresh-JVM sf10 block measured
the opposite (7.03s r11-on -> 9.75s r12-off, both sentinel-clean). The
driver's environment is the contract, so this probe reproduces ITS
shape: every measurement runs in a FRESH child JVM (bench._spawn_block
precedent — a long-lived local JVM inflated q06@sf10 2.5x), variants
alternate round-robin inside each trial so both sides see the same
host-noise window, and min-of-N trials per variant is reported with the
per-child contention sentinel.

Variants:
  wgl_off  row_number window form under the r12 session default
           (windowGroupLimitThreshold=-1: no inferred partial top-k).
  wgl_on   same window form with the threshold restored to Spark's
           default (1000) — the r11 behavior the driver measured faster.
  agg      priority_dedup_agg min_by form (VERDICT item 3: partial
           aggregation shrinks the shuffle to <=1 row per (task, key));
           runs under the r12 session default conf.

An `equality` child runs once before timing: order-independent
full-column hash of every variant's output must match the window form
(the declared-query result), or the probe aborts.

Usage: python tools/wgl_ab_probe.py [sf_dir] [trials] [repeats]
  sf_dir   default /tmp/waterdata_spark_sf10 (generated if missing)
  trials   default 6 (min-of-6 per side, per VERDICT item 1)
  repeats  default 2 in-child repeats; the child reports its min
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("wgl_off", "wgl_on", "agg")
SF10_PARTITIONS = 320  # bench.SHUFFLE_PARTITIONS["10"]


def _q06_window(spark, sf_dir):
    from waterdata_spark.queries import QUERIES

    return QUERIES["q06_priority_dedup"].fn(spark, sf_dir)


def _q06_agg(spark, sf_dir):
    from pyspark.sql import functions as F

    from waterdata_spark.operators.dedup import priority_dedup_agg
    from waterdata_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    sort_key = F.struct(
        (-F.col("l_extendedprice")).alias("p"), F.col("l_linenumber").alias("l")
    )
    return priority_dedup_agg(li, ["l_orderkey"], sort_key)


def _child(variant: str, sf_dir: str, repeats: int) -> None:
    from waterdata_spark.session import get_spark

    import bench

    extra = {}
    if variant == "wgl_on":
        extra["spark.sql.optimizer.windowGroupLimitThreshold"] = "1000"
    spark = get_spark("wgl-ab-probe", extra_conf=extra or None)
    spark.conf.set("spark.sql.shuffle.partitions", str(SF10_PARTITIONS))

    from waterdata_spark.schemas import load_table

    if variant == "equality":
        # order-independent hash equality of agg vs window output
        from pyspark.sql import functions as F

        def ohash(df):
            cols = [F.col(f.name) for f in df.schema.fields]
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal(38,0) sum: 2^63-magnitude terms overflow a
                # long sum under ANSI (Spark 4 default); decimal is
                # exact to 38 digits, far above n*2^63 here
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            return (r["n"], str(r["h"]))

        hw = ohash(_q06_window(spark, sf_dir))
        ha = ohash(_q06_agg(spark, sf_dir))
        print(json.dumps({"variant": "equality", "window": hw, "agg": ha,
                          "equal": hw == ha}))
        return

    # warm like the bench: page-cache the input + JIT the window path
    load_table(spark, sf_dir, "lineitem").count()
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _t = spark.range(200_000).select(
        (_F.col("id") % 997).alias("k"),
        _F.sha2(_F.col("id").cast("string"), 256).alias("h"),
    )
    _t.withColumn(
        "rn", _F.row_number().over(_W.partitionBy("k").orderBy("h"))
    ).filter("rn = 1").agg(_F.max("h")).collect()

    fn = _q06_agg if variant == "agg" else _q06_window
    sent0 = bench._sentinel_sec()
    runs = []
    import gc

    for _ in range(repeats):
        t0 = time.time()
        df = fn(spark, sf_dir)
        bench._drain(df)
        runs.append(round(time.time() - t0, 3))
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    sent1 = bench._sentinel_sec()
    print(json.dumps({
        "variant": variant,
        "runs": runs,
        "min": min(runs),
        "sentinel": [sent0, sent1],
        "drift": round(max(sent0, sent1) / max(min(sent0, sent1), 1e-9), 3),
        "load1": round(os.getloadavg()[0], 1),
        "threshold": spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold"),
    }))


def _spawn(variant: str, sf_dir: str, repeats: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_WGL_VARIANT"] = variant
    env["SPARK_GRAFT_WGL_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_WGL_REPEATS"] = str(repeats)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        timeout=1800,
    )
    if r.returncode != 0:
        raise RuntimeError(f"child {variant} failed rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if os.environ.get("SPARK_GRAFT_WGL_VARIANT"):
        _child(
            os.environ["SPARK_GRAFT_WGL_VARIANT"],
            os.environ["SPARK_GRAFT_WGL_SF_DIR"],
            int(os.environ.get("SPARK_GRAFT_WGL_REPEATS", "2")),
        )
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waterdata_spark_sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    if not os.path.exists(os.path.join(sf_dir, "_SCALED")):
        from tools.scale_testdata import ensure_scaled
        from waterdata_spark.session import get_spark

        spark = get_spark("wgl-probe-datagen")
        sf1 = "/tmp/waterdata_spark_sf1"
        assert ensure_scaled(spark, "/root/testdata/sf0.1", sf1, factor=10)
        assert ensure_scaled(spark, sf1, sf_dir, factor=10)
        spark.stop()
        os.sync()

    eq = _spawn("equality", sf_dir, 1)
    print(f"# equality: {eq}", file=sys.stderr)
    assert eq["equal"], f"agg form output differs from window form: {eq}"

    results: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    for t in range(trials):
        order = VARIANTS[t % len(VARIANTS):] + VARIANTS[:t % len(VARIANTS)]
        for v in order:
            res = _spawn(v, sf_dir, repeats)
            results[v].append(res)
            print(f"# trial {t} {v}: min {res['min']}s of {res['runs']} "
                  f"(drift {res['drift']}, load1 {res['load1']})",
                  file=sys.stderr)
    summary = {
        "sf_dir": sf_dir,
        "trials": trials,
        "repeats": repeats,
        "equality_ok": True,
        "per_variant": {
            v: {
                "min": min(r["min"] for r in results[v]),
                "trial_mins": [r["min"] for r in results[v]],
                "drifts": [r["drift"] for r in results[v]],
            }
            for v in VARIANTS
        },
    }
    # head-to-head within each trial window (same noise regime)
    for a, b in (("wgl_off", "wgl_on"), ("agg", "wgl_off"), ("agg", "wgl_on")):
        wins = sum(
            1 for x, y in zip(
                (r["min"] for r in results[a]), (r["min"] for r in results[b])
            ) if x < y
        )
        summary[f"{a}_beats_{b}"] = f"{wins}/{trials}"
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
