"""At-birth probe for the near-dup ingest stage (streaming/neardup.py,
r12): per-batch cost of `ingest_batch(neardup_dir=...)` across three
decades of stored-corpus size, with both stores compacted (digest base
bucketed on the digest; band base bucketed on the band hash; both
gates rebuilt at compaction — the maintenance state a live release
runs in).

Protocol mirrors tools/ingest_scale_probe.py: seed the documents table
as one bulk batch (untimed), compact (untimed maintenance), then time
a FIXED batch of 2,000 genuinely-new documents (vowel-translated
stored text — every char shingle rewritten) + 250 exact dups + 250
NEAR-dups (stored text with a 3-char suffix — char-shingle Jaccard >>
the 0.7 threshold). The near-dup stage's cost anatomy: batch signature
pass (batch-bounded), L0 band collisions (compaction-cadence-bounded),
gate-filtered bucket-pruned base collisions (collision-bounded), and
the exact-verify text fetch (candidate-bounded, shard-pruned release
read). Results -> SCALING.md.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPEATS = int(os.environ.get("NEARDUP_PROBE_REPEATS", "3"))
SCHEMA = "doc_id long, text string"


def _block(spark, sf_dir: str, work: str) -> dict:
    from waterdata_spark.schemas import load_table
    from waterdata_spark.streaming.ingest import (
        compact_digests,
        ingest_batch,
        init_ingest,
    )
    from waterdata_spark.streaming.neardup import compact_bands, init_neardup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = docs.count()
    # genuinely NEW text: vowel translation rewrites nearly every char
    # shingle, so fresh docs neither exact- nor NEAR-duplicate stored
    # content (the exact-ingest probe's suffix-salt trick would make
    # every fresh doc a near-dup here — caught by this probe's first
    # run landing 87/2500)
    fresh = docs.limit(2000).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.translate(F.col("text"), "aeiou", "01234").alias("text"),
    )
    exact_dups = docs.limit(250).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    near_dups = (
        docs.filter(F.length("text") > 200)
        .limit(250)
        .select(
            (F.col("doc_id") + 30_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" nd")).alias("text"),
        )
    )
    batch = fresh.unionByName(exact_dups).unionByName(near_dups).persist()
    n_batch = batch.count()

    runs, n_new = [], None
    for rep in range(REPEATS):
        base = os.path.join(work, f"rep{rep}")
        rel, dig, gate, nd, bg = (
            os.path.join(base, "release"),
            os.path.join(base, "digests"),
            os.path.join(base, "gate"),
            os.path.join(base, "bands"),
            os.path.join(base, "bgate"),
        )
        # parquet release + many shards: the candidate text fetch is
        # shard-pruned, and pruning needs n_shards >> candidate count
        # (at 100 TB a release has thousands of shards; JSONL parse of
        # the whole release dominated the probe's first run)
        init_ingest(
            spark, rel, dig, gate, n_shards=64, fmt="parquet",
            cms_width=1 << 20,
        )
        init_neardup(spark, nd, gate_dir=bg, cms_width=1 << 20)
        # untimed: seed + compact both stores (the maintained state)
        ingest_batch(
            docs, 0, rel, dig, gate, neardup_dir=nd, release_schema=SCHEMA
        )
        compact_digests(spark, dig, target_rows_per_bucket=1024)
        compact_bands(spark, nd, target_rows_per_bucket=1024)
        t0 = time.time()
        n_new = ingest_batch(
            batch, 1, rel, dig, gate, neardup_dir=nd, release_schema=SCHEMA
        )
        runs.append(round(time.time() - t0, 3))
        shutil.rmtree(base, ignore_errors=True)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    batch.unpersist()
    sec = min(runs)
    return {
        "stored_docs": n_base,
        "batch_docs": n_batch,
        "new_landed": n_new,
        "sec": sec,
        "runs": runs,
        "core_us_per_batch_doc": round(1e6 * sec * 32 / max(n_batch, 1), 1),
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    work = "/tmp/neardup_probe_work"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("neardup-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "neardup_scale_probe", "repeats": REPEATS}
    out["sf0.1"] = _block(spark, sf01, os.path.join(work, "a"))
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1, os.path.join(work, "b"))
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10, os.path.join(work, "c"))
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
