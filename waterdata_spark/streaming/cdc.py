"""Streaming CDC: maintain a table incrementally from a changelog
stream via ``foreachBatch`` + :func:`operators.merge.apply_changes`.

Storage is versioned parquet snapshots with a pointer file — each
micro-batch reads the current version, merges, and writes a NEW
version directory before atomically advancing the pointer (write-then-
rename). Never overwrite the directory being read: a lazy scan over a
path that an overwrite is deleting is the classic read-your-own-delete
corruption. At warehouse scale this versioning is what a table format
(Delta/Iceberg snapshots) provides natively; the sink demonstrates the
same copy-on-write merge loop on plain parquet, and ``apply_changes``'s
replay idempotence makes a re-delivered micro-batch a no-op on the
table content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def read_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current snapshot of a versioned table, or None before the first
    version exists."""
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, version))


def _publish(df: DataFrame, table_dir: str, version: str) -> None:
    path = os.path.join(table_dir, version)
    df.write.mode("overwrite").parquet(path)
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(table_dir, _POINTER))  # atomic pointer swap


def init_table(df: DataFrame, table_dir: str) -> None:
    """Seed version 0 of a versioned table."""
    os.makedirs(table_dir, exist_ok=True)
    _publish(df, table_dir, "v0")


def vacuum_table(table_dir: str, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` version directories (the live
    one always survives). Returns the removed version names. Run it
    out-of-band — a reader that resolved the pointer before a vacuum
    still needs its snapshot, so ``keep >= 2`` is the safe floor while
    queries are in flight."""
    import shutil

    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        # same error surface as apply_cdc_batch on the same condition
        raise RuntimeError(f"CDC table not initialized: {table_dir} (call init_table)")
    with open(ptr) as f:
        live = f.read().strip()
    versions = sorted(
        (d for d in os.listdir(table_dir) if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]),
    )
    doomed = [v for v in versions[:-max(keep, 1)] if v != live]
    for v in doomed:
        shutil.rmtree(os.path.join(table_dir, v))
    return doomed


def cdc_upsert_sink(
    changes_stream: DataFrame,
    table_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    op_col: str = "op",
    seq_col: str = "seq",
):
    """Start an ``availableNow`` foreachBatch query applying each
    changelog micro-batch to the versioned table. Returns the
    StreamingQuery (caller awaits termination).

    Each batch writes version ``v{live+1}`` (live = the POINTER's
    version, never the batch id) then swaps the pointer, so a failure
    mid-write leaves the previous version live — the merge is
    all-or-nothing per batch. Versioning off the pointer is what makes
    checkpoint REPLAY safe: a replayed batch reads the already-merged
    live snapshot and writes a fresh next version (content-identical,
    by apply_changes' latest-seq-wins idempotence) instead of
    overwriting the very directory it is lazily reading — batch-id
    naming deadlocks there ('cannot overwrite a path being read
    from'). A fresh checkpoint against an existing table composes for
    the same reason.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(batch_df, table_dir, keys, op_col=op_col, seq_col=seq_col)

    return (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def apply_cdc_batch(
    batch_df: DataFrame,
    table_dir: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> str:
    """One CDC merge step against the versioned table (the foreachBatch
    body, callable directly — e.g. to test replay semantics). Returns
    the published version name."""
    from waterdata_spark.operators.merge import apply_changes

    spark = batch_df.sparkSession
    target = read_table(spark, table_dir)
    if target is None:
        raise RuntimeError(f"CDC table not initialized: {table_dir} (call init_table)")
    with open(os.path.join(table_dir, _POINTER)) as f:
        live_n = int(f.read().strip().lstrip("v"))
    merged = apply_changes(target, batch_df, keys, op_col=op_col, seq_col=seq_col)
    version = f"v{live_n + 1}"
    _publish(merged, table_dir, version)
    return version
