"""One-off experiment for VERDICT r6 item 4: q18_asof_join is the
worst clean-run scaler (3.25x/decade sf0.1->sf1). Is the union+window
plan (operators/asof.py) superlinear by nature, or was the r6 number a
fixed-32-shuffle-partition artifact (q06's story, which probe-settled
at 2.40x with scaled partitions)?

Method: the q06 probe protocol with the r6 HONEST drain — time q18 at
sf1 and sf10 (same replica generator bench.py uses) under
  (a) the bench default  spark.sql.shuffle.partitions = 32,
  (b) partitions scaled with data (sqrt rule: 100 @ sf1 -> 320 @ sf10,
      AQE coalescing back down where the data doesn't need them),
min-of-3, full-column hash-agg drain (bench._drain — a bare count()
would let Catalyst prune the carried payload struct and the window
itself out of the plan).

Prints one JSON line; SCALING.md records the verdict.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _drain  # noqa: E402
from tools.scale_testdata import ensure_scaled  # noqa: E402
from waterdata_spark.queries import QUERIES  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402


def _q18_dedup_first(spark, sf_dir):
    """The pre-r12 plan: a priority_dedup window over clicks (its own
    shuffle+sort on (user, ts)) BEFORE the as-of union window — kept
    here as the probe's comparison arm after queries.py fused the
    dedup into the as-of window via right_order (VERDICT r11 item 8)."""
    from pyspark.sql import functions as F

    from waterdata_spark.operators.asof import asof_join
    from waterdata_spark.operators.dedup import priority_dedup
    from waterdata_spark.schemas import load_table

    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = priority_dedup(
        e.filter(F.col("event_type") == "click").select(
            "user_id", "ts_us", "event_id", "value"
        ),
        ["user_id", "ts_us"],
        [F.col("event_id").desc()],
    )
    out = asof_join(
        errors, clicks, on=["user_id"], ts="ts_us", payload=["event_id", "value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("click_id"),
        F.col("value_right").alias("click_value"),
    )


def _time_q18(spark, sf_dir: str, partitions: int, repeats: int = 3, fn=None) -> float:
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    fn = fn or QUERIES["q18_asof_join"].fn
    best = float("inf")
    for _ in range(repeats):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        _drain(fn(spark, sf_dir))
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("q18-scale-probe")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)

    # warm the JVM outside any timed window
    _drain(QUERIES["q18_asof_join"].fn(spark, sf1))

    out = {
        "sf01_p32": _time_q18(spark, sf01, 32),
        "sf1_p100": _time_q18(spark, sf1, 100),
        "sf10_p320": _time_q18(spark, sf10, 320),
        # r12 comparison arm: the pre-fusion plan (separate dedup window)
        "sf1_p100_dedup_first": _time_q18(spark, sf1, 100, fn=_q18_dedup_first),
        "sf10_p320_dedup_first": _time_q18(spark, sf10, 320, fn=_q18_dedup_first),
    }
    out["decade2_ratio_scaled"] = round(out["sf10_p320"] / out["sf1_p100"], 2)
    out["decade2_ratio_dedup_first"] = round(
        out["sf10_p320_dedup_first"] / out["sf1_p100_dedup_first"], 2
    )
    print(json.dumps({"metric": "q18_scale_probe", **out}))


if __name__ == "__main__":
    main()
