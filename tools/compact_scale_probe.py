"""Leveled-compaction scale probe (r12): is delta compaction's cost
bounded by the NEWLY ingested rows while the full fold's grows with the
stored corpus?

Protocol per decade (documents table at sf0.1 / sf1-replica /
sf10-replica = 5k / 50k / 500k stored docs): seed the store in one bulk
batch and full-fold it into a bucketed base (untimed setup), ingest one
FIXED 2,500-doc batch (untimed), then time (a) `compact_digests(mode=
'delta')` and (b) `compact_digests(mode='full')` from identical store
states (the store directory is re-seeded per timing — compaction
mutates state, so each measurement starts from its own copy). min-of-N,
one JVM.

The claim under test: (a) stays FLAT across the decades (its input is
the fixed batch) while (b) grows with the stored corpus (it rewrites
the world) — making the auto mode's amortized maintenance cost O(new)
with a periodic O(corpus) fold, instead of O(corpus) per compaction.

Prints ONE JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("COMPACT_PROBE_REPEATS", "3"))


def _block(spark, sf_dir: str, work: str) -> dict:
    from waterdata_spark.schemas import load_table
    from waterdata_spark.streaming.ingest import (
        compact_digests,
        ingest_batch,
        init_ingest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = docs.count()
    batch = (
        docs.limit(2500)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe-salt-xyz")).alias("text"),
        )
        .persist()
    )
    batch.count()

    # seed ONE canonical store (untimed), then copy it per measurement —
    # compaction mutates state, so every timing starts from its own copy
    seed = os.path.join(work, "seed")
    rel, dig, gate = (
        os.path.join(seed, "release"),
        os.path.join(seed, "digests"),
        os.path.join(seed, "gate"),
    )
    init_ingest(spark, rel, dig, gate, n_shards=16, cms_width=1 << 20)
    ingest_batch(docs, 0, rel, dig, gate)
    compact_digests(spark, dig, target_rows_per_bucket=1024, gate_dir=gate)
    ingest_batch(batch, 1, rel, dig, gate)

    out = {"stored_docs": n_base, "batch_docs": 2500}
    for mode in ("delta", "full"):
        runs = []
        for rep in range(REPEATS):
            cp = os.path.join(work, f"{mode}{rep}")
            shutil.copytree(seed, cp)
            cdig, cgate = os.path.join(cp, "digests"), os.path.join(cp, "gate")
            t0 = time.time()
            compact_digests(spark, cdig, gate_dir=cgate, mode=mode)
            runs.append(round(time.time() - t0, 3))
            shutil.rmtree(cp, ignore_errors=True)
            gc.collect()
        out[mode] = {"sec": min(runs), "runs": runs}
    batch.unpersist()
    shutil.rmtree(seed, ignore_errors=True)
    return out


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    work = "/tmp/compact_probe_work"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    spark = get_spark("compact-probe")
    have_sf1 = ensure_scaled(spark, sf01, sf1, factor=10)
    have_sf10 = have_sf1 and ensure_scaled(spark, sf1, sf10, factor=10)
    out = {"metric": "compact_scale_probe", "repeats": REPEATS}
    out["sf0.1"] = _block(spark, sf01, os.path.join(work, "a"))
    if have_sf1:
        out["sf1"] = _block(spark, sf1, os.path.join(work, "b"))
    if have_sf10:
        out["sf10"] = _block(spark, sf10, os.path.join(work, "c"))
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
