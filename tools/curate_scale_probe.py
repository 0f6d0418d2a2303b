"""Dedicated-JVM probe for the composed curation cascade
(`pipelines/curate.curate_corpus`): the end-to-end number a pipeline
owner actually budgets — normalize-off, exact dedup + boilerplate +
quality gate + near-dup + PII, ONE action, observe()-instrumented.

Same discipline as the other probes: fresh child JVM per scale block,
min-of-3 with explicit GC, contention sentinel around the repeats.
The near-dup stage runs its documented internal convergence actions;
everything else rides the single drain.

Blocks: documents at sf0.1 (20k docs), x10 (200k). Prints one JSON
line; SCALING.md records the verdict.
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
    from bench import _sentinel_sec
    from waterdata_spark.pipelines.curate import curate_corpus
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    spark = get_spark("curate-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_in = d.count()  # page-cache warm

    def run():
        # quality gate off: the synthetic random-word documents are
        # not Gopher-shaped, and a gate that empties the corpus would
        # make the near-dup stage measure nothing
        res = curate_corpus(
            d,
            boilerplate_min_docs=3,
            near_dup={"n_hashes": 16, "n_bands": 4, "k": 8, "threshold": 0.7},
            redact=True,
        )
        n_out = res.df.count()  # the one action
        return n_out, res.report()

    run()  # plan-compile warm, untimed
    sent_before = _sentinel_sec()
    runs = []
    n_out, funnel = 0, []
    for _ in range(REPEATS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n_out, funnel = run()
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
                "rows_in": n_in,
                "rows_out": n_out,
                "funnel": funnel,
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
    spark = get_spark("curate-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "curate_scale_probe"}
    for label, sf_dir, parts in [("sf01_p32", sf01, 32), ("sf1_p32", sf1, 32)]:
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
    out["decade_ratio_fixed32"] = round(
        out["sf1_p32"]["sec"] / out["sf01_p32"]["sec"], 2  # type: ignore[index]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
