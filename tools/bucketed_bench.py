"""VERDICT r5 item 6: TIME the bucketed-layout win, don't just
plan-pin it. The zero-Exchange claim for bucketed joins
(sources/bucketed.py; tests/test_plans.py pins the plan) had never
been measured.

Method: at sf1 (10x replica of sf0.1, same generator bench.py uses),
persist lineitem+orders twice — plain parquet tables and hash-bucketed
on the join key — then min-of-3 two workloads a warehouse repeats
daily against the same fact layout:

- fact-fact equi-join + aggregate (lineitem ⋈ orders on orderkey →
  revenue by orderpriority), broadcast disabled so the measurement is
  shuffle-vs-no-shuffle (at 100 TB neither side broadcasts);
- merge_upsert (operators/merge.py): a 10%-of-keys change feed
  full-outer-merged into the orders table.

The bucketed variant pays its shuffle ONCE at write time (reported as
*_write_sec); every subsequent join/merge on that key skips the fact
Exchange. The JSON line reports both sides so the amortization math is
explicit. Output is committed to SCALING.md.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_testdata import ensure_scaled  # noqa: E402
from waterdata_spark.operators.merge import merge_upsert  # noqa: E402
from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402
from waterdata_spark.sources.bucketed import read_table, write_bucketed  # noqa: E402

N_BUCKETS = 64


def _timed(fn, repeats: int = int(os.environ.get("BKB_REPEATS", "3"))) -> float:
    best = float("inf")
    for _ in range(repeats):
        gc.collect()
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def _join_agg(li, o):
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .count()
    )


def _merge(o, chg):
    return merge_upsert(o, chg, ["o_orderkey"]).count()


def _change_feed(o):
    """10% of orders keys with a changed totalprice — localCheckpoint so
    the feed is a fixed input, not a live subquery of the target."""
    return (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .localCheckpoint()
    )


def main() -> None:
    spark = get_spark("bucketed-bench")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    assert ensure_scaled(spark, sf01, sf1, 10)
    sf_label = os.environ.get("BKB_SF", "1")
    if sf_label == "10":
        sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
        assert ensure_scaled(spark, sf1, sf10, 10)
        data_dir = sf10
    else:
        data_dir = sf1
    wh = "/tmp/waterdata_bucketed_bench"

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkb LOCATION '{wh}'")
    out: dict = {"sf": int(sf_label), "n_buckets": N_BUCKETS}
    # the measurement is shuffle-vs-no-shuffle: at 100 TB neither fact
    # side broadcasts, so disable broadcast paths (incl. AQE's runtime
    # conversion) for the whole bench
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # shuffle partitions MUST equal the bucket count: a one-side-bucketed
    # join (merge_upsert's target ⟗ change-feed) only reuses the bucket
    # layout when the required distribution matches it — with a different
    # partition count the planner re-shuffles the bucketed side too and
    # the layout win evaporates (measured: merge 2.29s at p=100 vs the
    # bucketed table's 64 buckets; see SCALING.md for the p=64 number)
    spark.conf.set("spark.sql.shuffle.partitions", str(N_BUCKETS))
    try:
        li = load_table(spark, data_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_quantity"
        )
        o = load_table(spark, data_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )

        t0 = time.monotonic()
        li.write.mode("overwrite").saveAsTable("bkb.li_plain")
        o.write.mode("overwrite").saveAsTable("bkb.o_plain")
        out["plain_write_sec"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        write_bucketed(li, "bkb.li_b", ["l_orderkey"], N_BUCKETS, sort_cols=["l_orderkey"])
        write_bucketed(o, "bkb.o_b", ["o_orderkey"], N_BUCKETS, sort_cols=["o_orderkey"])
        out["bucketed_write_sec"] = round(time.monotonic() - t0, 3)

        lip, op = read_table(spark, "bkb.li_plain"), read_table(spark, "bkb.o_plain")
        lib, ob = read_table(spark, "bkb.li_b"), read_table(spark, "bkb.o_b")

        # sanity: the bucketed join plan must be Exchange-free
        jp = lib.join(ob, lib.l_orderkey == ob.o_orderkey)
        plan = jp._jdf.queryExecution().executedPlan().toString()
        out["bucketed_join_exchanges"] = plan.count("Exchange")

        out["join_plain_sec"] = _timed(lambda: _join_agg(lip, op))
        out["join_bucketed_sec"] = _timed(lambda: _join_agg(lib, ob))

        chg_p, chg_b = _change_feed(op), _change_feed(ob)
        out["merge_plain_sec"] = _timed(lambda: _merge(op, chg_p))
        out["merge_bucketed_sec"] = _timed(lambda: _merge(ob, chg_b))

        out["join_speedup"] = round(out["join_plain_sec"] / out["join_bucketed_sec"], 2)
        out["merge_speedup"] = round(out["merge_plain_sec"] / out["merge_bucketed_sec"], 2)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkb CASCADE")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
