"""At-birth probe for the end-to-end incremental ingest
(streaming/ingest.py): per-document ingest cost across three decades
of CORPUS-ALREADY-INGESTED size — the number that matters for a live
release is not the batch's size but whether cost grows with the
stored corpus (it must not: the anti-join is digest-vs-digest with
the CMS gate bounding what reaches it, the release append touches
only the batch's files, the gate merge is counter-table-bounded).

Protocol: ingest the documents table as a base corpus (one batch),
then time a FIXED-size fresh batch (2,000 new docs + 500 duplicates
of stored content, built from the same table with salted ids) against
stored corpora of 5k / 50k / 500k docs. One JVM, min-of-N per block,
GC between repeats (each repeat ingests under a NEW batch id into a
COPY of the store state? No — repeats would mutate state, so each
repeat uses its own freshly-initialized store seeded by one bulk
batch; the seeding is untimed). Results -> SCALING.md.
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

REPEATS = int(os.environ.get("INGEST_PROBE_REPEATS", "3"))
CMS_W = 1 << 20
#: base-gate form: cms (counter table) or bloom (bit-packed, r12)
GATE_KIND = os.environ.get("INGEST_PROBE_GATE", "cms")


def _block(spark, sf_dir: str, work: str, bucketed: bool = True) -> dict:
    from waterdata_spark.schemas import load_table
    from waterdata_spark.streaming.ingest import (
        compact_digests,
        ingest_batch,
        init_ingest,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = docs.count()
    # fixed-size probe batch: 2,000 genuinely new docs (salted ids +
    # salted text) and 500 exact duplicates of stored content
    fresh = (
        docs.limit(2000)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe-salt-xyz")).alias("text"),
        )
    )
    dups = docs.limit(500).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    batch = fresh.unionByName(dups).persist()
    batch.count()

    runs, n_new = [], None
    for rep in range(REPEATS):
        base = os.path.join(work, f"rep{rep}")
        rel, dig, gate = (
            os.path.join(base, "release"),
            os.path.join(base, "digests"),
            os.path.join(base, "gate"),
        )
        init_ingest(
            spark, rel, dig, gate, n_shards=16, cms_width=CMS_W,
            gate_kind=GATE_KIND, bloom_bits=1 << 23,
        )
        # untimed: seed the stored corpus in one bulk batch
        ingest_batch(docs, 0, rel, dig, gate)
        if bucketed:
            # untimed MAINTENANCE: compact into a bucketed base with
            # rows-per-bucket FIXED across the decades (r12). Target
            # 1024 — the bucket-count experiment (SCALING.md r12 entry)
            # measured that finer buckets regress at THIS corpus size
            # (per-file open overhead swamps the row pruning: B=4096
            # cost 13s/batch vs 3.7s at B=256 on 500k stored rows);
            # pruning wins the candidate-bounded regime only when each
            # bucket is a real file (~64 MB), i.e. at billions of rows.
            compact_digests(
                spark, dig, target_rows_per_bucket=1024, gate_dir=gate
            )
        t0 = time.time()
        n_new = ingest_batch(batch, 1, rel, dig, gate)
        runs.append(round(time.time() - t0, 3))
        shutil.rmtree(base, ignore_errors=True)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    batch.unpersist()
    sec = min(runs)
    return {
        "stored_docs": n_base,
        "batch_docs": 2500,
        "new_landed": n_new,
        "sec": sec,
        "runs": runs,
        "core_us_per_batch_doc": round(1e6 * sec * 32 / 2500, 1),
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    work = "/tmp/ingest_probe_work"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("ingest-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    bucketed = os.environ.get("INGEST_PROBE_BUCKETED", "1") != "0"
    out = {
        "metric": "ingest_scale_probe",
        "repeats": REPEATS,
        "bucketed": bucketed,
        "gate": GATE_KIND,
    }
    out["sf0.1"] = _block(spark, sf01, os.path.join(work, "a"), bucketed)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1, os.path.join(work, "b"), bucketed)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10, os.path.join(work, "c"), bucketed)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
