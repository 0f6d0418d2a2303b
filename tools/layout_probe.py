"""Measure the sort-clustered layout's data-skipping win
(sources/layout.py) at sf10: write lineitem plain vs range-clustered
on l_shipdate, audit footer-level pruning for a one-month predicate,
and min-of-N a date-bounded aggregate on both layouts.

The footer audit is the scale-transferable number (fraction of row
groups a stats-respecting scan touches — layout property, independent
of cluster size); the timing shows it materializes locally too.
Prints one JSON line; results recorded in SCALING.md.
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
from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402
from waterdata_spark.sources.layout import skipping_stats, write_sorted  # noqa: E402

REPEATS = int(os.environ.get("LAYOUT_REPEATS", "5"))
# one month out of the ~7-year l_shipdate span (~1.2% of rows)
LO, HI = "1996-03-01", "1996-03-31"


def _timed(fn) -> float:
    best = float("inf")
    for _ in range(REPEATS):
        gc.collect()
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def _agg(df) -> int:
    return (
        df.filter(F.col("l_shipdate").between(LO, HI))
        .agg(F.sum("l_extendedprice").alias("rev"), F.count(F.lit(1)).alias("n"))
        .count()
    )


def main() -> None:
    spark = get_spark("layout-probe")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)

    li = load_table(spark, sf10, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    plain_path, sorted_path = "/tmp/layout_plain", "/tmp/layout_sorted"

    t0 = time.monotonic()
    li.write.mode("overwrite").parquet(plain_path)
    plain_write = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    write_sorted(li, sorted_path, ["l_shipdate"], n_files=32)
    sorted_write = round(time.monotonic() - t0, 3)

    out = {
        "sf": 10,
        "predicate": f"l_shipdate in [{LO}, {HI}]",
        "plain_write_sec": plain_write,
        "sorted_write_sec": sorted_write,
    }
    for tag, path in (("plain", plain_path), ("sorted", sorted_path)):
        import datetime

        lo_ts = datetime.datetime.fromisoformat(LO)
        hi_ts = datetime.datetime.fromisoformat(HI + "T23:59:59")
        st = skipping_stats(path, "l_shipdate", lo_ts, hi_ts)
        out[f"{tag}_row_groups_scanned"] = f"{st['n_row_groups_scanned']}/{st['n_row_groups']}"
        out[f"{tag}_files_scanned"] = f"{st['n_files_scanned']}/{st['n_files']}"
        df = spark.read.parquet(path)
        out[f"{tag}_query_sec"] = _timed(lambda d=df: _agg(d))
    out["speedup"] = round(out["plain_query_sec"] / out["sorted_query_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
