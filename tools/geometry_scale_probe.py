"""Dedicated-JVM scale probe for the r8 geometry trainers:
distributed k-means (`operators/clustering.kmeans`) and exact-moment
PCA (`operators/embeddings.fit_pca`).

Both operators reduce the corpus to bounded driver state (k*dim /
d*d), so the scale question is the per-iteration reduce: k-means runs
n_iter explode->combine passes of n*dim rows; PCA runs one n*dim mean
pass plus one n*d(d+1)/2 second-moment pass. Per the project's probe
discipline (q18/x08/dedup_against precedent), each (scale, partitions)
block runs in a FRESH child JVM, min-of-3 with explicit GC between
repeats and the contention sentinel timed around the block.

Workload: embeddings table (64-d) at sf0.1 (2k vectors), x10 (20k),
x100 (200k) — kmeans k=16, n_iter=3, seeded init; PCA n_components=16.
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
    from bench import _sentinel_sec
    from waterdata_spark.operators.clustering import kmeans
    from waterdata_spark.operators.embeddings import fit_pca
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    spark = get_spark("geometry-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()  # page-cache warm

    def km():
        model, asg = kmeans(e, "vec_id", "embedding", k=16, n_iter=3, seed=7)
        # the returned assignment is lazy — drain it so the timing
        # includes the final labeling pass, not just the fit
        asg.count()
        return int(sum(model.sizes))

    def pca():
        m = fit_pca(e, "embedding", 16)
        return m.n

    out = {"rows": n}
    for name, fn in [("kmeans", km), ("pca", pca)]:
        fn()  # plan-compile warm, untimed
        sent_before = _sentinel_sec()
        runs = []
        for _ in range(REPEATS):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            fn()
            runs.append(round(time.monotonic() - t0, 3))
        sent_after = _sentinel_sec()
        drift = round(
            max(sent_before, sent_after) / max(min(sent_before, sent_after), 1e-9), 3
        )
        out[name] = {
            "sec": min(runs),
            "runs": runs,
            "sentinel_drift": drift,
            "contended": drift > 1.15,
        }
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]))
        return

    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("geometry-probe-datagen")
    assert ensure_scaled(spark, sf01, sf1, 10) and ensure_scaled(spark, sf1, sf10, 10)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "geometry_scale_probe"}
    for label, sf_dir, parts in [
        ("sf01_p32", sf01, 32),
        ("sf1_p32", sf1, 32),
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

    def sec(k: str, op: str) -> float:
        return out[k][op]["sec"]  # type: ignore[index,call-overload]

    for op in ("kmeans", "pca"):
        out[f"{op}_decade1_fixed32"] = round(sec("sf1_p32", op) / sec("sf01_p32", op), 2)
        out[f"{op}_decade2_fixed32"] = round(sec("sf10_p32", op) / sec("sf1_p32", op), 2)
        out[f"{op}_decade2_scaled"] = round(sec("sf10_p320", op) / sec("sf1_p32", op), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
