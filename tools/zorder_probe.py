"""Measure the Z-order layout's multi-column data-skipping win
(sources/layout.write_zordered) at sf10 on lineitem: write the table
(a) single-key-sorted on l_shipdate and (b) z-ordered on
(l_shipdate, l_partkey), then audit footer-level pruning and time a
bounded aggregate for a predicate on EACH column.

The claim under test: the sorted layout prunes only its leading key
(the l_partkey predicate scans everything), while the z-order layout
prunes BOTH — the footer fractions are the scale-transferable numbers
(layout property, independent of cluster size). Prints one JSON line;
results recorded in SCALING.md.
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
from waterdata_spark.sources.layout import (  # noqa: E402
    skipping_stats,
    write_sorted,
    write_zordered,
)

REPEATS = int(os.environ.get("LAYOUT_REPEATS", "5"))
# one month of ~7 years (~1.2%) and a ~1.5% partkey slice
DATE_LO, DATE_HI = "1996-03-01", "1996-03-31"


def _timed(fn) -> float:
    best = float("inf")
    for _ in range(REPEATS):
        gc.collect()
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("zorder-probe")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)

    li = load_table(spark, sf10, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate", "l_extendedprice"
    )
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    pk_lo, pk_hi = int(pk_max * 0.40), int(pk_max * 0.415)

    sorted_path, z_path = "/tmp/layout_sorted2", "/tmp/layout_zorder"
    t0 = time.monotonic()
    write_sorted(li, sorted_path, ["l_shipdate"], n_files=64)
    sorted_write = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    write_zordered(
        li, z_path, ["l_shipdate", "l_partkey"], bits_per_col=8, n_files=64
    )
    z_write = round(time.monotonic() - t0, 3)

    import datetime

    date_lo = datetime.datetime.fromisoformat(DATE_LO)
    date_hi = datetime.datetime.fromisoformat(DATE_HI + "T23:59:59")

    out = {
        "sf": 10,
        "sorted_write_sec": sorted_write,
        "zorder_write_sec": z_write,
        "date_pred": f"[{DATE_LO}, {DATE_HI}]",
        "partkey_pred": f"[{pk_lo}, {pk_hi}]",
    }
    os.sync()  # let write-back settle so timings don't race the flush
    for tag, path in (("sorted", sorted_path), ("zorder", z_path)):
        sd = skipping_stats(path, "l_shipdate", date_lo, date_hi)
        sp = skipping_stats(path, "l_partkey", pk_lo, pk_hi)
        out[f"{tag}_date_rg"] = f"{sd['n_row_groups_scanned']}/{sd['n_row_groups']}"
        out[f"{tag}_partkey_rg"] = f"{sp['n_row_groups_scanned']}/{sp['n_row_groups']}"
        df = spark.read.parquet(path)
        df.count()  # page-cache warm: time the pruning, not the disk
        out[f"{tag}_date_query_sec"] = _timed(
            lambda d=df: d.filter(F.col("l_shipdate").between(date_lo, date_hi))
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
            .count()
        )
        out[f"{tag}_partkey_query_sec"] = _timed(
            lambda d=df: d.filter(F.col("l_partkey").between(pk_lo, pk_hi))
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
            .count()
        )
    out["partkey_speedup"] = round(
        out["sorted_partkey_query_sec"] / out["zorder_partkey_query_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
