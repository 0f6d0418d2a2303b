"""End-to-end incremental corpus ingest (r11): the composition the
r10/r11 incremental pieces exist for — a crawl stream lands in a
LIVE RELEASE, deduplicated against everything already ingested, with
every maintained artifact updated exactly-once per micro-batch:

    batch → within-batch exact dedup → cross-corpus exact dedup
    (digest anti-join, CMS-gated so unseen rows skip it)
    → append_training_shards (staged, batch-pointer-guarded)
    → digest store append → CMS gate merge

Replay safety is PER SUB-STORE, each with its own idempotence guard,
so a crash at any point resumes cleanly on Structured Streaming's
redelivery of the uncommitted batch:

- the release append uses ``append_training_shards(batch_id=...)`` —
  staged data files moved by atomic rename, manifest
  ``last_append_batch`` as the replay guard;
- the digest store is append-only parquet partitioned by batch
  (``batch=N/`` rewritten whole on replay — idempotent overwrite);
- the CMS gate uses ``streaming/gates.cms_batch``'s (version,
  batch_id) pointer.

A replayed batch therefore re-runs only the sub-steps that had not
completed, and each of those is idempotent. Single writer per release
(the Structured Streaming model — one query owns one checkpoint).

The dedup semantics are EXACT: the CMS gate only routes rows (no
false negatives — sketches.py contract); membership truth is the
digest anti-join against the stored digest set, which this sink
maintains as fixed-width sha2 rows (the content never rides the
check). Rows surviving both dedups are what lands in the release, so
ingesting the same crawl twice yields the same corpus as ingesting it
once (test-pinned).

Reference parity: no counterpart in the reference engine; the
composition of X1 (cross-corpus dedup) + X7 (release) + X6/X8
(incremental maintenance) — SURVEY §2.9.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup import (
    content_digest,
    dedup_against_exact,
    exact_dedup,
)
from waterdata_spark.sources.shards import append_training_shards
from waterdata_spark.streaming.gates import cms_batch, init_cms_store, read_cms

__all__ = [
    "compact_digests",
    "ingest_batch",
    "ingest_stream_sink",
    "init_ingest",
    "read_digests",
]

_DIGEST_COL = "__ingest_digest"


def init_ingest(
    spark: SparkSession,
    release_dir: str,
    digest_dir: str,
    gate_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    fmt: str = "json",
    cms_depth: int = 4,
    cms_width: int = 1 << 20,
) -> None:
    """Create the three stores empty: a zero-row release (manifest
    records the layout parameters every append reuses), an empty
    digest store, an empty CMS gate. Schema for the release comes from
    a caller-shaped empty frame on first append (JSONL/parquet are
    schema-on-write per file), so init only needs the column NAMES."""
    from waterdata_spark.sources.shards import _write_manifest

    os.makedirs(release_dir, exist_ok=True)
    _write_manifest(
        release_dir,
        {
            "n_shards": n_shards,
            "format": fmt,
            "salt": "shard42",
            "id_col": id_col,
            "text_col": text_col,
            "shuffle_seed": None,
            "curriculum": False,
            "total_rows": 0,
            "shards": {},
        },
    )
    os.makedirs(digest_dir, exist_ok=True)
    init_cms_store(
        spark.createDataFrame([], f"{_DIGEST_COL} string"),
        gate_dir,
        _DIGEST_COL,
        depth=cms_depth,
        width=cms_width,
    )


def read_digests(
    spark: SparkSession, digest_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """The stored digest set (one sha2 string column): the compacted
    base (if :func:`compact_digests` has run) plus all per-batch
    directories; empty frame when nothing has been ingested.
    ``exclude_batch`` drops that batch's own directory — the REPLAY
    guard :func:`ingest_batch` needs: on redelivery after a crash the
    batch's digests may already be stored, and reading them back would
    make the batch look all-duplicate and overwrite its digest
    directory with an empty frame (found in design review — the
    survivor set must be a pure function of the state BEFORE the
    batch)."""
    parts = [
        d
        for d in os.listdir(digest_dir)
        if d.startswith("batch=") and d != f"batch={exclude_batch}"
    ]
    base = _read_compact_pointer(digest_dir)
    if base is not None:
        parts.append(base)
    if not parts:
        return spark.createDataFrame([], f"{_DIGEST_COL} string")
    return spark.read.parquet(*[os.path.join(digest_dir, b) for b in parts])


_COMPACT = "_COMPACT"


def _read_compact_pointer(digest_dir: str) -> str | None:
    ptr = os.path.join(digest_dir, _COMPACT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip()


def compact_digests(spark: SparkSession, digest_dir: str) -> str:
    """Fold the per-batch digest directories into one compacted base
    (r11): a live ingest accumulates one directory (with one-or-more
    small files) per micro-batch — after thousands of batches the
    stored-digest scan every :func:`ingest_batch` pays is dominated by
    file-open overhead, not rows. Run this periodically (it is a
    MAINTENANCE action, not part of the batch path): it writes
    base ∪ batches as a new base version, atomically swaps the
    ``_COMPACT`` pointer, then removes the folded inputs.

    Crash-safe in the direction that matters: the pointer swap is an
    atomic rename, and a crash BEFORE the old directories are removed
    leaves some digests present in both the new base and a batch
    directory — duplicate rows in the stored SET, which the anti-join
    semantics tolerate (membership is unchanged); the next compaction
    folds the leftovers away. Run from ONE process, not concurrently
    with an in-flight ingest batch (single-writer, like the stores)."""
    import shutil

    old_base = _read_compact_pointer(digest_dir)
    batches = sorted(
        d for d in os.listdir(digest_dir) if d.startswith("batch=")
    )
    parts = list(batches) + ([old_base] if old_base else [])
    if not parts:
        raise RuntimeError(f"nothing to compact in {digest_dir}")
    merged = spark.read.parquet(*[os.path.join(digest_dir, p) for p in parts])
    n = int(old_base.split("_v")[1]) + 1 if old_base else 0
    new_base = f"base_v{n}"
    merged.write.mode("overwrite").parquet(os.path.join(digest_dir, new_base))
    tmp = os.path.join(digest_dir, _COMPACT + ".tmp")
    with open(tmp, "w") as f:
        f.write(new_base)
    os.replace(tmp, os.path.join(digest_dir, _COMPACT))
    for p in parts:
        if p != new_base:
            shutil.rmtree(os.path.join(digest_dir, p), ignore_errors=True)
    return new_base


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    release_dir: str,
    digest_dir: str,
    gate_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    prepare=None,
) -> int:
    """One ingest step (the foreachBatch body, callable directly — the
    replay tests do). Returns the number of NEW documents that landed
    in the release (0 for an all-duplicate batch; a replayed batch
    recomputes the same survivor set and each sub-store no-ops).

    ``prepare``: optional ``DataFrame -> DataFrame`` applied to the
    batch BEFORE dedup — the curation hook (e.g. ``lambda b:
    curate_corpus(b, quality_gate={}, audit=False).df`` runs the
    stateless cascade stages per micro-batch, so only curated
    survivors reach the corpus). It must be DETERMINISTIC (the
    replayed batch must reproduce the same survivor set) and
    stateless per batch; corpus-wide stages (boilerplate thresholds,
    near-dup across batches) belong in a batch re-curation, not here.

    The gate is SERVED with the parameters recorded in the gate store
    at :func:`init_ingest` time — never caller-supplied ones (r11
    review catch: probing a depth×width counter table with a different
    width looks up absent buckets, flags every row "definitely new",
    skips the exact anti-join, and silently duplicates the corpus;
    reading ``_PARAMS.json`` makes that mismatch impossible).

    Batches must apply IN ORDER (Structured Streaming guarantees this
    — a batch commits before the next starts; direct callers must keep
    the same discipline): the gate's no-false-negative guarantee for
    batch M relies on batch N < M having completed its gate update."""
    from waterdata_spark.streaming.gates import _read_params

    spark = batch_df.sparkSession
    gate_params = _read_params(gate_dir)
    if gate_params.get("seed") != "xgate":
        # dedup_against_exact's prefilter hashes with the fixed 'xgate'
        # seed; a store built under another seed cannot serve it
        raise ValueError(
            f"gate store seed {gate_params.get('seed')!r} != 'xgate' — "
            "init the ingest gate with the default seed"
        )
    if prepare is not None:
        batch_df = prepare(batch_df)
    # the digest column ONCE, then within-batch dedup ON it — every
    # later step (dedup election, anti-join, gate, store, sketch)
    # rides the fixed-width digest; the text is never re-hashed
    # (content_digest's documented digest-once pattern). Persist:
    # three sub-stores consume this frame and the upstream (a
    # streaming batch) must evaluate deterministically across them
    # (the split-plan contract).
    keyed = exact_dedup(
        batch_df.withColumn(_DIGEST_COL, content_digest([text_col])),
        [],
        id_col,
        digest_col=_DIGEST_COL,
    )
    stored = read_digests(spark, digest_dir, exclude_batch=batch_id)
    gate = read_cms(spark, gate_dir)
    new = dedup_against_exact(
        keyed,
        stored,
        content_cols=[],
        digest_col=_DIGEST_COL,
        prefilter="cms",
        prefilter_cms=gate,
        prefilter_depth=gate_params["depth"],
        prefilter_width=gate_params["width"],
    ).persist()
    try:
        n_new = new.count()
        # release append: staged + manifest-pointer-guarded
        append_training_shards(
            new.drop(_DIGEST_COL), release_dir, batch_id=batch_id
        )
        # digest store: whole-batch-directory overwrite == idempotent
        new.select(_DIGEST_COL).write.mode("overwrite").parquet(
            os.path.join(digest_dir, f"batch={batch_id}")
        )
        # CMS gate: its own (version, batch_id) pointer skips replays
        cms_batch(new.select(_DIGEST_COL), gate_dir, batch_id)
    finally:
        new.unpersist()
    return n_new


def ingest_stream_sink(
    stream: DataFrame,
    release_dir: str,
    digest_dir: str,
    gate_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    prepare=None,
):
    """Start an ``availableNow`` foreachBatch query running
    :func:`ingest_batch` per micro-batch (gate parameters come from
    the gate store itself; ``prepare`` is the per-batch curation hook
    — see :func:`ingest_batch`). Returns the StreamingQuery (caller
    awaits termination). Keep ONE checkpoint per release for its
    whole life — batch ids restart with a fresh checkpoint and the
    replay guards key on them."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df,
            batch_id,
            release_dir,
            digest_dir,
            gate_dir,
            id_col=id_col,
            text_col=text_col,
            prepare=prepare,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
