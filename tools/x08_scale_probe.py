"""Dedicated-JVM standalone probe for x08_minhash_bands (VERDICT r7
item 2): the last headline scale ratio resting on suite context.

Every suite-context scale number this project re-measured standalone
has come down (q18 3.25x suite -> 1.35x probe; q06 4.5-8x -> 2.40x;
dedup_against 4.4x -> 2.0-2.7x) because a long-lived local JVM
accumulates heap fragmentation, storage-manager state and GC debt that
inflate later queries. x08's driver-side 4.27x/decade (local 3.54x)
was measured inside the full headline suite; this probe gives it the
same treatment the others got: each (scale, partitions) block runs in
a FRESH child JVM (the bench._spawn_block rationale), min-of-3 with
the honest full-column drain and explicit GC between repeats.

Workload = exactly the bench entry (bench._minhash_bench): xxhash64
production path, 16 hashes / 4 bands, input repartitioned to the
session parallelism (the sf replicas are single parquet files — an
unrepartitioned scan pins the whole hash pass to one task and measures
the file layout, not the operator).

Blocks: sf0.1@32, sf1@32, sf1@100, sf10@32, sf10@320 — fixed-32
ratios separate plan growth from partition-count artifacts, scaled
partitions (the bench's sqrt-ish rule) are the canonical numbers.

Prints one JSON line; SCALING.md records the verdict.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3


def _child(sf_dir: str, partitions: int) -> None:
    from bench import _drain, _minhash_bench, _sentinel_sec
    from waterdata_spark.session import get_spark

    spark = get_spark("x08-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    from waterdata_spark.schemas import load_table

    load_table(spark, sf_dir, "documents").count()  # page-cache warm
    _drain(_minhash_bench(spark, sf_dir))  # plan-compile warm, untimed
    sent_before = _sentinel_sec()
    runs = []
    for _ in range(REPEATS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n = _drain(_minhash_bench(spark, sf_dir))
        runs.append(round(time.monotonic() - t0, 3))
    sent_after = _sentinel_sec()
    drift = round(
        max(sent_before, sent_after) / max(min(sent_before, sent_after), 1e-9), 3
    )
    print(
        json.dumps(
            {
                "sec": min(runs),
                "runs": runs,
                "rows": n,
                "sentinel_drift": drift,
                "contended": drift > 1.15,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]))
        return

    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("x08-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)
    spark.stop()  # children get the machine to themselves
    os.sync()

    out: dict[str, object] = {"metric": "x08_scale_probe"}
    for label, sf_dir, parts in [
        ("sf01_p32", sf01, 32),
        ("sf1_p32", sf1, 32),
        ("sf1_p100", sf1, 100),
        ("sf10_p32", sf10, 32),
        ("sf10_p320", sf10, 320),
    ]:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", sf_dir, str(parts)],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3000,
            check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out[label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)
    sec = lambda k: out[k]["sec"]  # noqa: E731
    out["decade1_ratio_fixed32"] = round(sec("sf1_p32") / sec("sf01_p32"), 2)
    out["decade2_ratio_fixed32"] = round(sec("sf10_p32") / sec("sf1_p32"), 2)
    out["decade1_ratio_scaled"] = round(sec("sf1_p100") / sec("sf01_p32"), 2)
    out["decade2_ratio_scaled"] = round(sec("sf10_p320") / sec("sf1_p100"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
