"""At-birth scale probe for `urlfilter.registered_domains_psl` (r10).

Plan under test: corpus → DISTINCT hosts → suffix-chain explode
(fan-out = label count) → broadcast join against the ~100-row vendored
rule frame (a full PSL is ~10k rows — same broadcast class) →
max(struct) rule selection → broadcast map join-back. Expected shape:
per-row core cost FALLS with scale (fixed plan overhead amortizes; the
rule frame is constant-size), and cost tracks the DISTINCT-host count,
not the row count — the 100 TB claim is that a billion-URL crawl pays
for its hosts, not its rows.

Hosts are synthesized from the lineitem table at three decades
(sf0.1/sf1/sf10 ≈ 600k/6M/60M rows) with a bounded host universe
(~38k distinct), so the probe directly demonstrates the
rows-vs-hosts separation.
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

REPEATS = int(os.environ.get("PSL_PROBE_REPEATS", "4"))


def _hosts(spark, sf_dir: str):
    from waterdata_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    k = F.xxhash64(F.col("l_orderkey"), F.col("l_partkey"))
    sub = (
        F.when(F.pmod(k, F.lit(3)) == 1, F.lit("www."))
        .when(F.pmod(k, F.lit(3)) == 2, F.lit("a.b."))
        .otherwise(F.lit(""))
    )
    tld = (
        F.when(F.pmod(k, F.lit(5)) == 0, F.lit(".github.io"))
        .when(F.pmod(k, F.lit(5)) == 1, F.lit(".co.uk"))
        .when(F.pmod(k, F.lit(5)) == 2, F.lit(".ck"))
        .when(F.pmod(k, F.lit(5)) == 3, F.lit(".com"))
        .otherwise(F.lit(".zz"))
    )
    host = F.concat(sub, F.lit("site-"), F.pmod(k, F.lit(2531)).cast("string"), tld)
    return li.select(host.alias("host"))


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.functions.urls import load_psl
    from waterdata_spark.operators.urlfilter import registered_domains_psl

    psl = load_psl()
    df = _hosts(spark, sf_dir)
    n_rows = df.count()  # warm
    n_hosts = df.distinct().count()
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        out = registered_domains_psl(df, psl, host_col="host")
        _drain(out)
        runs.append(round(time.time() - t0, 3))
        del out
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    sec = min(runs)
    print(f"# {sf_dir}: {n_rows} rows / {n_hosts} hosts, min {sec}s of {runs}", file=sys.stderr)
    return {
        "rows": n_rows,
        "hosts": n_hosts,
        "sec": sec,
        "core_us_per_row": round(1e6 * sec * 32 / max(n_rows, 1), 3),
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("psl-scale-probe")
    spark.range(64).count()

    out = {"metric": "psl_scale_probe"}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
