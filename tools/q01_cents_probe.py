"""q01 long-cents vs decimal aggregation A/B (VERDICT r12 item 7).

The r12 attempt was inconclusive under host noise. This probe re-runs
it interleaved in one JVM (expression-level A/B — both sides share the
identical scan/shuffle shape, so same-JVM alternation is a fair
comparison and doubles the samples per noise window):

  decimal  the declared q01 form: sum(cast(x as decimal(18,s)))
           with Spark's decimal(28,s) sum buffer.
  cents    per-row conversion to integral cents/micros
           (cast(x as decimal(18,s)) * 10^s -> long), sum(long)
           buffers, and an exact decimal division back at the end —
           value-identical at any group sum below 2^63 micro-units
           (~9.2e12 dollars; guarded: ANSI sum(long) raises on
           overflow rather than wrapping, and the decimal form stays
           the shipped fallback).

An equality child compares full output hashes first; the probe aborts
on any difference.

Usage: python tools/q01_cents_probe.py [sf_dir] [rounds] (default
       /tmp/waterdata_spark_sf10, 6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from waterdata_spark.queries import QUERIES  # noqa: E402
from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def q01_cents(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def cents_sum(c, scale: int):
        col = F.col(c) if isinstance(c, str) else c
        return F.sum(
            (col.cast(f"decimal(18,{scale})") * F.lit(10 ** scale)).cast("long")
        )

    def money(sum_cents, scale: int):
        # exact: the long total is integral n; decimal division by 10^s
        # reproduces n/10^s exactly, then one cast to double — the same
        # nearest-double the decimal form's final cast produces.
        return (sum_cents.cast("decimal(38,0)") / F.lit(10 ** scale)).cast("double")

    qty = cents_sum("l_quantity", 2)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money(qty, 2).alias("sum_qty"),
        money(cents_sum("l_extendedprice", 2), 2).alias("sum_base_price"),
        money(cents_sum(disc_price, 6), 6).alias("sum_disc_price"),
        money(cents_sum(charge, 6), 6).alias("sum_charge"),
        (money(qty, 2) / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q01_split(spark, sf_dir):
    """The 100 TB-SAFE long form (r13): straight long cents/micros
    overflow at the target scale (a 100 TB lineitem's per-group charge
    sum is ~5.9e21 micro-units >> 2^63 ~ 9.2e18), so each money sum is
    split into TWO long sums — the dollar part ``floor(x)`` and the
    non-negative sub-dollar remainder in base units — recombined
    exactly in decimal(38,0) after aggregation. Identity per row:
    units == floor(x)*10^s + r with r in [0, 10^s), so the recombined
    total equals the exact unit sum; headroom is now bounded by
    sum(dollars) < 2^63 (~150 PB at TPC-H prices) and every overflow
    beyond it raises under ANSI instead of wrapping."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def split_money(c, scale: int):
        col = F.col(c) if isinstance(c, str) else c
        m = 10 ** scale
        dec = col.cast(f"decimal(18,{scale})")
        units = (dec * F.lit(m)).cast("long")
        hi = F.floor(dec).cast("long")
        lo = units - hi * F.lit(m)
        total = F.sum(hi).cast("decimal(38,0)") * F.lit(m) + F.sum(lo)
        return (total / F.lit(m)).cast("double")

    qty = split_money("l_quantity", 2)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qty.alias("sum_qty"),
        split_money("l_extendedprice", 2).alias("sum_base_price"),
        split_money(disc_price, 6).alias("sum_disc_price"),
        split_money(charge, 6).alias("sum_charge"),
        (qty / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waterdata_spark_sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("q01-cents-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "320")
    load_table(spark, sf_dir, "lineitem").count()  # page-cache warm

    dec_fn = QUERIES["q01_pricing_summary"].fn

    def ohash(df):
        cols = [F.col(f.name) for f in df.schema.fields]
        r = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.xxhash64(*cols)).alias("h")
        ).collect()[0]
        return (r["n"], r["h"])

    variants = [("decimal", dec_fn), ("cents", q01_cents), ("split", q01_split)]
    hd = ohash(dec_fn(spark, sf_dir))
    for name, fn in variants[1:]:
        hv = ohash(fn(spark, sf_dir))
        assert hd == hv, f"{name} form differs: {hd} vs {hv}"
    print(f"# equality OK (all variants): {hd}", file=sys.stderr)

    res = {name: [] for name, _ in variants}
    for r in range(rounds):
        order = variants[r % len(variants):] + variants[: r % len(variants)]
        for name, fn in order:
            t0 = time.time()
            bench._drain(fn(spark, sf_dir))
            res[name].append(round(time.time() - t0, 3))
        print(f"# round {r}: {res}", file=sys.stderr)
    sent = bench._sentinel_sec()
    print(json.dumps({
        "sf_dir": sf_dir,
        "rounds": rounds,
        **{
            name: {"min": min(res[name]), "runs": res[name]}
            for name, _ in variants
        },
        "sentinel_after": sent,
        "load1": round(os.getloadavg()[0], 1),
    }))


if __name__ == "__main__":
    main()
