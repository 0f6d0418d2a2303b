"""Streaming corpus-profile maintenance: the incremental-statistics
story end-to-end. Each micro-batch of an ingest stream is sketched
(``operators/sketches.hll_profile``) and MERGED into a stored profile
— the 100 TB corpus's running statistics (row/null counts exact,
distinct counts via HLL) stay current at ingest speed, and nothing
ever rescans the corpus.

Storage is the CDC module's versioned-parquet pattern (write a new
version directory, atomically swap a pointer — never overwrite what a
lazy reader may be scanning), with one addition: the pointer records
the last APPLIED streaming batch id, because unlike
``apply_changes`` (latest-seq-wins — naturally idempotent) a sketch
merge is additive: replaying a micro-batch after a checkpoint recovery
would double-count ``n_rows``. The pointer write is a single atomic
rename carrying (version, batch_id), so a replayed batch sees itself
already applied and no-ops — exactly-once on the profile content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from waterdata_spark.operators.sketches import (
    estimate_hll_profile,
    hll_profile,
    merge_hll_profiles,
)

_POINTER = "_LATEST"

__all__ = [
    "init_profile",
    "read_profile",
    "current_profile",
    "profile_batch",
    "profile_stream_sink",
]


def _read_pointer(table_dir: str) -> tuple[str, int] | None:
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version, batch = f.read().strip().split("|")
    return version, int(batch)


def _publish(df: DataFrame, table_dir: str, version: str, batch_id: int) -> None:
    df.write.mode("overwrite").parquet(os.path.join(table_dir, version))
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(f"{version}|{batch_id}")
    os.replace(tmp, os.path.join(table_dir, _POINTER))


def init_profile(
    df: DataFrame, table_dir: str, columns: list[str], lg_k: int = 12
) -> None:
    """Seed version 0 from a (possibly empty) frame — e.g. the batch
    profile of the corpus as of stream start, or ``df.limit(0)`` for
    an empty start."""
    os.makedirs(table_dir, exist_ok=True)
    _publish(hll_profile(df, columns, lg_k), table_dir, "v0", -1)


def read_profile(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """The stored (mergeable) profile frame, or None if uninitialized."""
    state = _read_pointer(table_dir)
    if state is None:
        return None
    return spark.read.parquet(os.path.join(table_dir, state[0]))


def current_profile(spark: SparkSession, table_dir: str) -> DataFrame:
    """The stored profile with estimates materialized
    (column, n_rows, n_nulls, distinct_est)."""
    prof = read_profile(spark, table_dir)
    if prof is None:
        raise RuntimeError(f"profile not initialized: {table_dir}")
    return estimate_hll_profile(prof)


def profile_batch(
    batch_df: DataFrame,
    table_dir: str,
    columns: list[str],
    batch_id: int,
    lg_k: int = 12,
) -> str | None:
    """One merge step (the foreachBatch body, callable directly — the
    replay test does). Skips (returns None) when ``batch_id`` is the
    pointer's last applied batch — the checkpoint-replay no-op that
    makes the additive merge exactly-once. (Structured Streaming
    replays at most the last uncommitted batch and batch ids are
    monotonic per checkpoint, so equality with the last applied id is
    the standard transactional-sink guard; it assumes one checkpoint
    lineage per profile — keep the checkpoint directory for the life
    of the profile, as a fresh checkpoint restarts batch ids at 0.)"""
    spark = batch_df.sparkSession
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"profile not initialized: {table_dir} (call init_profile)")
    version, last_batch = state
    if batch_id == last_batch:
        return None
    stored = spark.read.parquet(os.path.join(table_dir, version))
    merged = merge_hll_profiles(stored, hll_profile(batch_df, columns, lg_k))
    next_version = f"v{int(version.lstrip('v')) + 1}"
    _publish(merged, table_dir, next_version, batch_id)
    return next_version


def profile_stream_sink(
    stream: DataFrame,
    table_dir: str,
    columns: list[str],
    checkpoint_dir: str,
    lg_k: int = 12,
):
    """Start an ``availableNow`` foreachBatch query maintaining the
    stored profile from an ingest stream. Returns the StreamingQuery
    (caller awaits termination). ``lg_k`` must match the stored
    profile's (the sketches-module merge contract)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        profile_batch(batch_df, table_dir, columns, batch_id, lg_k)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
