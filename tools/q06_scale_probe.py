"""One-off experiment for VERDICT r4 item 3: is q06's measured
5.2x/decade at sf10 a PLAN defect or a CONFIG artifact of running a
100x shuffle through a fixed 32 shuffle partitions?

Method: generate the sf1/sf10 replica sets (same generator bench.py
uses), then time q06 at both scales under
  (a) the bench default  spark.sql.shuffle.partitions = 32,
  (b) partitions scaled with data (sqrt rule: 32 @ sf1 -> 320 @ sf10,
      AQE coalescing back down where the data doesn't need them).
`spark.sql.shuffle.partitions` is a runtime conf read at planning
time, so both variants run in ONE JVM, min-of-3 with the same forced
GC isolation bench.py uses.

Prints one JSON line; SCALING.md records the verdict.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waterdata_spark.queries import QUERIES  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402
from tools.scale_testdata import ensure_scaled  # noqa: E402


def _time_q06(spark, sf_dir: str, partitions: int, repeats: int = 3) -> float:
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    best = float("inf")
    for _ in range(repeats):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        QUERIES["q06_priority_dedup"].fn(spark, sf_dir).count()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("q06-scale-probe")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)

    # warm the JVM outside any timed window
    QUERIES["q06_priority_dedup"].fn(spark, sf1).count()

    out = {
        "sf1_p32": _time_q06(spark, sf1, 32),
        "sf10_p32": _time_q06(spark, sf10, 32),
        "sf1_p100": _time_q06(spark, sf1, 100),
        "sf10_p320": _time_q06(spark, sf10, 320),
    }
    out["decade_ratio_fixed32"] = round(out["sf10_p32"] / out["sf1_p32"], 2)
    out["decade_ratio_scaled"] = round(out["sf10_p320"] / out["sf1_p100"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
