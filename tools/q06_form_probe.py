"""q06 sort-free form A/B at sf10 (VERDICT r12 item 3: decade ratio).

The r12/r13 record already eliminated two q06 shapes: the inferred
window-group-limit (plans/r13/wgl_ab_probe_sf10.json — "off" wins) and
the min_by(struct) aggregate (31.55s min vs the window's 7.6s). The
min_by loss is structural, not a tuning miss: MaxMinBy is a
DeclarativeAggregate with a struct buffer, which HashAggregateExec
cannot hold (non-mutable buffer type) and ObjectHashAggregateExec does
not accept (TypedImperative only), so Spark plans it as SortAggregate
— it sorts anyway, with the payload widened by the ordering struct.

This probe times the remaining sort-FREE candidate against the window
form:

  window   the declared q06: Exchange -> Sort -> Window -> Filter.
  rxagg    one explicit hashpartitioning(l_orderkey) exchange, REUSED
           by both consumers (ReuseExchange/AQE stage reuse): a
           primitive-buffer HashAggregate max(l_extendedprice) per
           key, a per-partition SHUFFLE_HASH join back (build side =
           the 1-row-per-key maxima, no exchange — both sides already
           carry the required distribution), a null-safe price==max
           filter, then HashAggregate min(l_linenumber) per
           (key, price). No Sort operator anywhere; every aggregate
           buffer is a mutable primitive.

Semantics proof obligation (identical to the window form):
  - (l_orderkey, l_linenumber) is unique, so "max price then min
    linenumber" picks exactly the window's rn=1 row;
  - eqNullSafe handles the all-null-price group the way DESC NULLS
    LAST does (nulls lose to any non-null; an all-null group keeps
    its min-linenumber row);
  - an order-independent full-column hash equality child runs before
    any timing and aborts the probe on mismatch.

Measurement shape = tools/wgl_ab_probe.py (the driver-environment
reproduction): every sample in a FRESH child JVM, variants alternate
round-robin per trial, min-of-N with per-child sentinel. A `stages`
child additionally decomposes the window form's wall into scan-only /
scan+exchange / full (noop sink, guide §1.4) so the winner's margin
can be attributed.

Usage: python tools/q06_form_probe.py [sf_dir] [trials] [repeats]
  sf_dir   default /tmp/waterdata_spark_sf10 (generated if missing)
  trials   default 6
  repeats  default 2 in-child repeats; the child reports its min
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("window", "rxagg")
SF10_PARTITIONS = 320  # bench.SHUFFLE_PARTITIONS["10"]


def _q06_window(spark, sf_dir):
    from waterdata_spark.queries import QUERIES

    return QUERIES["q06_priority_dedup"].fn(spark, sf_dir)


def _q06_rxagg(spark, sf_dir):
    from pyspark.sql import functions as F

    from waterdata_spark.operators.dedup import priority_dedup_sortfree
    from waterdata_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return priority_dedup_sortfree(
        li, ["l_orderkey"], "l_extendedprice", "l_linenumber"
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


def _child(variant: str, sf_dir: str, repeats: int) -> None:
    from waterdata_spark.session import get_spark

    import bench

    spark = get_spark("q06-form-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(SF10_PARTITIONS))

    from waterdata_spark.schemas import load_table

    if variant == "equality":
        from pyspark.sql import functions as F

        def ohash(df):
            cols = [F.col(f.name) for f in df.schema.fields]
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            return (r["n"], str(r["h"]))

        hw = ohash(_q06_window(spark, sf_dir))
        ha = ohash(_q06_rxagg(spark, sf_dir))
        print(json.dumps({"variant": "equality", "window": hw, "rxagg": ha,
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

    if variant == "stages":
        # attribute the window form's wall: scan-only, scan+exchange,
        # full plan — each through the noop sink (guide §1.4)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        out = {"variant": "stages"}
        for name, df in (
            ("scan", li),
            ("scan_exchange", li.repartition(SF10_PARTITIONS, "l_orderkey")),
            ("full_window", _q06_window(spark, sf_dir)),
        ):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
        print(json.dumps(out))
        return

    fn = _q06_rxagg if variant == "rxagg" else _q06_window
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
    }))


def _spawn(variant: str, sf_dir: str, repeats: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_Q06_VARIANT"] = variant
    env["SPARK_GRAFT_Q06_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_Q06_REPEATS"] = str(repeats)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        timeout=1800,
    )
    if r.returncode != 0:
        raise RuntimeError(f"child {variant} failed rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if os.environ.get("SPARK_GRAFT_Q06_VARIANT"):
        _child(
            os.environ["SPARK_GRAFT_Q06_VARIANT"],
            os.environ["SPARK_GRAFT_Q06_SF_DIR"],
            int(os.environ.get("SPARK_GRAFT_Q06_REPEATS", "2")),
        )
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waterdata_spark_sf10"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    if not os.path.exists(os.path.join(sf_dir, "_SCALED")):
        from tools.scale_testdata import ensure_scaled
        from waterdata_spark.session import get_spark

        spark = get_spark("q06-form-probe-datagen")
        sf1 = "/tmp/waterdata_spark_sf1"
        assert ensure_scaled(spark, "/root/testdata/sf0.1", sf1, factor=10)
        assert ensure_scaled(spark, sf1, sf_dir, factor=10)
        spark.stop()
        os.sync()

    eq = _spawn("equality", sf_dir, 1)
    print(f"# equality: {eq}", file=sys.stderr)
    assert eq["equal"], f"rxagg output differs from window form: {eq}"

    stages = _spawn("stages", sf_dir, max(repeats, 2))
    print(f"# stages: {stages}", file=sys.stderr)

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
        "stages": stages,
        "per_variant": {
            v: {
                "min": min(r["min"] for r in results[v]),
                "trial_mins": [r["min"] for r in results[v]],
                "drifts": [r["drift"] for r in results[v]],
            }
            for v in VARIANTS
        },
    }
    wins = sum(
        1 for x, y in zip(
            (r["min"] for r in results["rxagg"]),
            (r["min"] for r in results["window"]),
        ) if x < y
    )
    summary["rxagg_beats_window"] = f"{wins}/{trials}"
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
