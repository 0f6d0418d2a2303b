"""Streaming-CDC cost curve at 10x (VERDICT r6 item 7): the batch
pipelines have 10x stream-vs-batch proofs, but the CDC sink's
full-snapshot-rewrite per micro-batch is the part that grows with
TABLE size, and it only had 1x tests.

Method: seed a versioned table from the orders table at sf0.1
(~150k rows) and at the 10x replica (~1.5M rows); apply the SAME
6-batch changelog shape at each scale (per batch: update 1% of keys,
insert 0.2% new keys, delete 0.1% — seq strictly increasing across
batches), timing each apply_cdc_batch (the exact foreachBatch body).
Then verify STREAM == BATCH at 10x: run the real cdc_upsert_sink
(file source, maxFilesPerTrigger=1 → one micro-batch per changelog
file) against a fresh copy of the table and check the final snapshot
equals one-shot apply_changes(base, full changelog) row-for-row.

Prints one JSON line: per-batch seconds at both scales, the 10x
per-batch cost ratio (expected ≈10x — the rewrite IS proportional to
snapshot size; that is the documented cost model of copy-on-write on
plain parquet, and the reason table formats do partition-pruned /
merge-on-read commits), and the stream==batch verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_testdata import ensure_scaled  # noqa: E402
from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402

N_BATCHES = 6


def _changelog(base, batch: int):
    """Deterministic per-batch changelog over the orders table: update
    1% of keys, insert 0.2% fresh keys (shifted id space), delete 0.1%.
    seq = batch so later batches win per apply_changes semantics."""
    upd = (
        base.filter(F.hash("o_orderkey", F.lit(batch)) % 100 == 0)
        .withColumn(
            "o_orderpriority",
            F.concat(F.lit(f"cdc-b{batch}:"), F.col("o_orderpriority")),
        )
        .withColumn("op", F.lit("update"))
    )
    ins = (
        base.filter(F.hash("o_orderkey", F.lit(batch + 50)) % 500 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10**12 + batch * 10**9))
        .withColumn("op", F.lit("insert"))
    )
    dele = base.filter(F.hash("o_orderkey", F.lit(batch + 100)) % 1000 == 0).withColumn(
        "op", F.lit("delete")
    )
    return upd.unionByName(ins).unionByName(dele).withColumn("seq", F.lit(batch))


def _snapshot_hash(df) -> tuple[int, int]:
    """Order-insensitive content digest: (row count, SUM of per-row
    xxhash64 over all columns, summed as decimal(38,0)) — sum, not
    bit_xor (any identical-row PAIR xor-cancels, so duplicate-row
    merge bugs could compare equal) and not a long sum (ANSI overflow
    at 1.5M hashes)."""
    row = df.select(
        F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).alias("__h")
    ).select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__h").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _timed_batches(spark, base, workdir: str) -> list[float]:
    from waterdata_spark.streaming.cdc import apply_cdc_batch, init_table

    table_dir = os.path.join(workdir, "table")
    init_table(base, table_dir)
    times = []
    for b in range(1, N_BATCHES + 1):
        chg = _changelog(base, b)
        chg.localCheckpoint()  # changelog build cost out of the timed window
        t0 = time.monotonic()
        apply_cdc_batch(chg, table_dir, ["o_orderkey"])
        times.append(round(time.monotonic() - t0, 3))
    return times


def _stream_vs_batch(spark, base, workdir: str) -> bool:
    from waterdata_spark.operators.merge import apply_changes
    from waterdata_spark.streaming.cdc import cdc_upsert_sink, init_table, read_table

    chg_dir = os.path.join(workdir, "changelog")
    os.makedirs(chg_dir)
    schema = None
    for b in range(1, N_BATCHES + 1):
        chg = _changelog(base, b)
        schema = chg.schema
        # one parquet dir per batch; maxFilesPerTrigger=1 would split on
        # FILES, so write each batch as a single file to keep batch
        # boundaries (content equality is batch-order-independent anyway
        # because seq wins, but per-batch grouping mirrors production)
        chg.coalesce(1).write.parquet(os.path.join(chg_dir, f"b{b}"))

    table_dir = os.path.join(workdir, "stream_table")
    init_table(base, table_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(chg_dir, "*"))
    )
    q = cdc_upsert_sink(stream, table_dir, ["o_orderkey"], os.path.join(workdir, "ckpt"))
    q.awaitTermination()

    full = None
    for b in range(1, N_BATCHES + 1):
        c = _changelog(base, b)
        full = c if full is None else full.unionByName(c)
    want = apply_changes(base, full, ["o_orderkey"])
    return _snapshot_hash(read_table(spark, table_dir)) == _snapshot_hash(want)


def main() -> None:
    spark = get_spark("cdc-scale-probe")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    assert ensure_scaled(spark, sf01, sf1, 10)

    out: dict = {"metric": "cdc_scale_probe", "n_batches": N_BATCHES}
    for label, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        base = load_table(spark, sf_dir, "orders")
        out[f"{label}_rows"] = base.count()
        workdir = tempfile.mkdtemp(prefix=f"cdc_probe_{label.replace('.', '')}_")
        try:
            times = _timed_batches(spark, base, workdir)
            out[f"{label}_batch_sec"] = times
            out[f"{label}_batch_min"] = min(times)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    out["per_batch_10x_ratio"] = round(out["sf1_batch_min"] / out["sf0.1_batch_min"], 2)

    workdir = tempfile.mkdtemp(prefix="cdc_probe_stream_")
    try:
        base10 = load_table(spark, sf1, "orders")
        out["stream_eq_batch_10x"] = _stream_vs_batch(spark, base10, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
