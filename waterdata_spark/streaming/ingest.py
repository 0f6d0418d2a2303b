"""End-to-end incremental corpus ingest (r11): the composition the
r10/r11 incremental pieces exist for — a crawl stream lands in a
LIVE RELEASE, deduplicated against everything already ingested, with
every maintained artifact updated exactly-once per micro-batch:

    batch → within-batch exact dedup → cross-corpus exact dedup
    (exact anti-join vs the recent L0 digest directories, then a
    CMS-gated candidate-bounded probe of the compacted base)
    → optional near-dup stage (streaming/neardup.py)
    → append_training_shards (staged, batch-pointer-guarded)
    → digest store append

Replay safety is PER SUB-STORE, each with its own idempotence guard,
so a crash at any point resumes cleanly on Structured Streaming's
redelivery of the uncommitted batch:

- the release append uses ``append_training_shards(batch_id=...)`` —
  staged data files moved by atomic rename, manifest
  ``last_append_batch`` as the replay guard;
- the digest store is append-only parquet partitioned by batch
  (``batch=N/`` rewritten whole on replay — idempotent overwrite);
- the CMS gate is a MAINTENANCE artifact (r12): rebuilt by
  :func:`compact_digests` to cover exactly the compacted base, never
  written on the hot path — per-batch replay cannot touch it. The
  rebuild AUTO-SIZES the gate to the base (``gate_auto_size``,
  default on) and records its estimated false-positive rate; a
  saturated gate is bypassed by the serving path instead of probed.

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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup import content_digest, exact_dedup
from waterdata_spark.sources.shards import append_training_shards
from waterdata_spark.streaming.gates import init_cms_store

__all__ = [
    "compact_digests",
    "digest_bucket",
    "ingest_batch",
    "ingest_stream_sink",
    "init_ingest",
    "read_digests",
]

_DIGEST_COL = "__ingest_digest"
_BKT = "__bkt"


def digest_bucket(digest: Column | str, n_buckets: int) -> Column:
    """The digest's bucket id in ``[0, n_buckets)`` — a pure function
    of the digest (``pmod(xxhash64(digest), n_buckets)``), so two equal
    digests ALWAYS share a bucket: pruning a stored-digest scan to the
    probe rows' buckets can never miss a membership hit."""
    return F.pmod(F.xxhash64(F.col(digest) if isinstance(digest, str) else digest),
                  F.lit(n_buckets)).cast("int")


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
    gate_kind: str = "cms",
    bloom_bits: int = 1 << 23,
    bloom_k: int = 4,
) -> None:
    """Create the three stores empty: a zero-row release (manifest
    records the layout parameters every append reuses), an empty
    digest store, an empty base gate. Schema for the release comes from
    a caller-shaped empty frame on first append (JSONL/parquet are
    schema-on-write per file), so init only needs the column NAMES.

    ``gate_kind`` (r12): ``'cms'`` (counter table — engine-reproducible
    rows, served by broadcast joins that grow with the table until its
    depth×width cap) or ``'bloom'`` (bit-packed filter ≤ 32 MB — served
    as ONE Arrow bit-gather whose cost is corpus-independent from the
    first batch; the stage profile showed the CMS broadcast as the last
    corpus-correlated per-batch term). Both are exact gates (no false
    negatives at any fill); a Bloom past ~n_bits/8 stored digests
    saturates toward flagging everything — still correct, just
    gate-less cost — so size ``bloom_bits`` to the corpus target."""
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
    # the digest store records its gate's location (r12) so
    # compact_digests can keep gate-coverage ⊇ base automatically —
    # a compaction that forgot the gate would leave it under-covering
    # the new base and silently duplicate the corpus
    with open(os.path.join(digest_dir, "_PARAMS.json"), "w") as f:
        import json as _json

        _json.dump({"kind": "digests", "gate_dir": gate_dir}, f, sort_keys=True)
    empty = spark.createDataFrame([], f"{_DIGEST_COL} string")
    if gate_kind == "cms":
        init_cms_store(
            empty, gate_dir, _DIGEST_COL, depth=cms_depth, width=cms_width
        )
    elif gate_kind == "bloom":
        from waterdata_spark.streaming.gates import init_bloom_store

        init_bloom_store(
            empty, gate_dir, _DIGEST_COL, n_bits=bloom_bits, k=bloom_k
        )
    else:
        raise ValueError(f"gate_kind must be 'cms' or 'bloom', got {gate_kind!r}")


def read_digests(
    spark: SparkSession,
    digest_dir: str,
    exclude_batch: int | None = None,
    buckets: list[int] | None = None,
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
    batch).

    ``buckets`` (r12 — the VERDICT r11 scan-floor fix): restrict the
    COMPACTED BASE to those ``digest_bucket`` partition directories.
    Membership probes for a known digest set S prune to S's buckets
    losslessly (:func:`digest_bucket` is a pure function of the
    digest), so the per-batch scan is bounded by
    ``|S's buckets| × rows-per-bucket`` instead of the whole stored
    set. Only the base prunes — the recent per-batch directories are
    small (bounded by ingest volume since the last compaction, the
    operational compaction cadence) and are always read whole, which
    also keeps correctness independent of any historical bucket-count
    change (the LSM discipline: pruned compacted levels, full L0).
    ``buckets=[]`` with a bucketed base skips the base entirely."""
    frames = []
    l0 = _read_batch_digests(spark, digest_dir, exclude_batch)
    if l0 is not None:
        frames.append(l0)
    base = _read_base_digests(spark, digest_dir, buckets)
    if base is not None:
        frames.append(base)
    if not frames:
        return spark.createDataFrame([], f"{_DIGEST_COL} string")
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def _read_batch_digests(
    spark: SparkSession, digest_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """The L0 component: all per-batch digest directories (None when
    there are none)."""
    parts = [
        d
        for d in os.listdir(digest_dir)
        if d.startswith("batch=") and d != f"batch={exclude_batch}"
    ]
    if not parts:
        return None
    return spark.read.parquet(
        *[os.path.join(digest_dir, b) for b in parts]
    ).select(_DIGEST_COL)


def _read_base_digests(
    spark: SparkSession, digest_dir: str, buckets: list[int] | None = None
) -> DataFrame | None:
    """The compacted-base component — the union of the pointer's LAYERS
    (r12 leveled compaction: ``base_vN`` plus any ``delta_vM`` layers a
    delta compaction appended, every layer bucketed the same way) —
    bucket-pruned per layer when ``buckets`` is given. None when no
    base exists or every bucket is pruned."""
    state = _read_compact_pointer(digest_dir)
    if state is None:
        return None
    names, n_buckets = state
    frames = []
    for name in names.split("+"):
        if name.startswith("delta_") or n_buckets is None or buckets is None:
            # delta layers are FLAT and cadence-bounded — read whole,
            # like the batch dirs they fold (the L0 argument); also the
            # unbucketed legacy base, or a caller wanting the whole set
            bdf = spark.read.parquet(os.path.join(digest_dir, name))
        elif not buckets:
            continue  # nothing to probe — this layer contributes nothing
        else:
            # partition pruning: the filter on the partition column
            # prunes unlisted bucket directories from the scan
            bdf = spark.read.parquet(os.path.join(digest_dir, name)).filter(
                F.col(_BKT).isin([int(b) for b in buckets])
            )
        frames.append(bdf.select(_DIGEST_COL))
    if not frames:
        return None
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


_COMPACT = "_COMPACT"


def _read_compact_pointer(digest_dir: str) -> tuple[str, int | None] | None:
    """(layer names, bucket count) — bucket count None for a legacy
    unbucketed base (pre-r12 pointer carried the name only). The name
    field is ``+``-joined when delta layers exist (r12 leveled
    compaction): ``base_v0+delta_v1+delta_v2``; a single full fold is
    just ``base_vN``. One atomic line carries data layout AND layer
    list together."""
    ptr = os.path.join(digest_dir, _COMPACT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        raw = f.read().strip()
    if "|" in raw:
        name, nb = raw.split("|", 1)
        return name, int(nb)
    return raw, None


def compact_digests(
    spark: SparkSession,
    digest_dir: str,
    n_buckets: int | None = None,
    target_rows_per_bucket: int | None = None,
    gate_dir: str | None = None,
    gate_auto_size: bool = True,
    mode: str = "auto",
    max_layers: int = 4,
) -> str:
    """Fold the per-batch digest directories into one compacted base
    (r11): a live ingest accumulates one directory (with one-or-more
    small files) per micro-batch — after thousands of batches the
    stored-digest scan every :func:`ingest_batch` pays is dominated by
    file-open overhead, not rows. Run this periodically (it is a
    MAINTENANCE action, not part of the batch path): it writes
    base ∪ batches as a new base version, atomically swaps the
    ``_COMPACT`` pointer, then removes the folded inputs.

    The base is BUCKETED on the digest (r12 — VERDICT r11 item 1):
    partition directories keyed by :func:`digest_bucket`, so
    :func:`ingest_batch`'s membership probe prunes its scan to the
    candidate rows' buckets instead of reading every stored digest per
    micro-batch. Bucket count: ``n_buckets`` explicitly, else sized
    from ``target_rows_per_bucket`` (next power of two of
    total/target), else the previous base's count carried forward
    (initial default 64). Sizing rule: pruning pays when the bucket
    count exceeds the typical PER-BATCH CANDIDATE count (gate-flagged
    rows, not batch size), and each bucket should still hold enough
    rows for a sane parquet file — re-bucketing as the store grows is
    just the next compaction with a new target. The bucket count rides
    the pointer (``base_vN|B``), so data and layout swap atomically
    together.

    The CMS gate is REBUILT here (r12) from the new base content,
    BEFORE the base pointer swap — gate-coverage ⊇ base at every
    instant (a crash between rebuild and swap leaves a superset gate:
    false positives only). ``gate_dir`` defaults to the location
    recorded by :func:`init_ingest` in the store's ``_PARAMS.json``;
    passing neither on a store that has a gate would leave the gate
    under-covering and silently duplicate the corpus.

    ``mode`` (r12 — LEVELED compaction): a full fold rewrites the
    WHOLE stored set every time — O(corpus) maintenance per compaction
    forever, which at billions of stored digests makes the compaction
    cadence itself the scale ceiling. ``'delta'`` folds ONLY the batch
    directories into a new FLAT ``delta_vN`` layer appended to the
    pointer's layer list (``base_v0+delta_v1+…|B``, one atomic line)
    and grows the gate by the additive merge
    (:func:`~waterdata_spark.streaming.gates.cms_accumulate` /
    ``bloom_accumulate``). Readers bucket-prune the ``base_*`` layers
    and read ``delta_*`` layers whole — a delta is cadence-bounded
    like the batch dirs it folds (the L0 argument), and bucketing it
    would cost O(bucket count) file creations for O(cadence) rows.
    The only corpus-coupled delta term is the CMS gate merge's
    counter-table rewrite, bounded by the CONFIGURED depth × width
    ceiling, not the corpus (the Bloom form's OR is flat 32 MB). ``'auto'`` (default)
    picks delta whenever it can — an existing bucketed base, no
    re-bucketing arguments, fewer than ``max_layers`` layers — and
    escalates to a full fold otherwise, so the amortized cost is
    O(new) with a periodic O(corpus) fold that also re-buckets and
    re-sizes the gate. Delta cannot re-bucket or resize the gate (a
    merge must match the stored layout); pass re-bucketing args or
    ``mode='full'`` for that. Crash windows: a written-but-unpointed
    delta is overwritten by the re-run (same name — version numbers
    come from the pointer); a gate merged twice before the pointer
    swap double-counts counters, which the membership reading
    (counter >= 1) tolerates.

    Crash-safe in the direction that matters: the pointer swap is an
    atomic rename, and a crash BEFORE the old directories are removed
    leaves some digests present in both the new base and a batch
    directory — duplicate rows in the stored SET, which the anti-join
    semantics tolerate (membership is unchanged); the next compaction
    folds the leftovers away. Run from ONE process, not concurrently
    with an in-flight ingest batch (single-writer, like the stores) —
    and NOT between a crash and the stream's restart either (ADVICE
    r11): folding an uncommitted batch's digest directory into the
    base before the replay makes the replayed batch recompute an empty
    survivor set — membership stays correct and the release append is
    pointer-guarded, but the batch's per-batch provenance directory is
    gone and :func:`ingest_batch` returns 0 instead of the original
    count (the replay guard in :func:`ingest_batch` skips the
    digest-directory overwrite in exactly this state, so the digests
    themselves are never lost)."""
    if gate_dir is None:
        params_path = os.path.join(digest_dir, "_PARAMS.json")
        if os.path.exists(params_path):
            import json as _json

            with open(params_path) as f:
                gate_dir = _json.load(f).get("gate_dir")
        else:
            # a pre-r12 store records no gate location: silently
            # compacting WITHOUT the gate rebuild would leave the gate
            # under-covering the new base — the false-negative /
            # silent-duplication direction (r12 review catch). Make the
            # caller decide explicitly.
            raise RuntimeError(
                f"{digest_dir} has no _PARAMS.json recording its gate "
                "location (pre-r12 store): pass gate_dir= explicitly so "
                "the gate is rebuilt with the base, or gate_dir=False "
                "for a store that truly has no gate"
            )
    if gate_dir is False:
        gate_dir = None
    rebuild_fn, accum_fn = _gate_fns(gate_dir, gate_auto_size)
    return _compact_layered_store(
        spark,
        digest_dir,
        select_cols=[_DIGEST_COL],
        bucket_col=_DIGEST_COL,
        n_buckets=n_buckets,
        target_rows_per_bucket=target_rows_per_bucket,
        mode=mode,
        max_layers=max_layers,
        gate_rebuild=rebuild_fn,
        gate_accumulate=accum_fn,
    )


def _gate_fns(gate_dir: str | None, gate_auto_size: bool):
    """(full-fold rebuild, delta accumulate) callbacks for the store's
    gate — kind-dispatched from the gate store's own params (so the
    band store gets the bloom branch for free if it ever records one).
    (None, None) when the store has no gate."""
    if gate_dir is None:
        return None, None
    from waterdata_spark.streaming.gates import _read_params as _gate_params
    from waterdata_spark.streaming.gates import (
        bloom_accumulate,
        bloom_rebuild,
        cms_accumulate,
        cms_rebuild,
    )

    if _gate_params(gate_dir).get("kind") == "bloom":
        return (
            lambda df: bloom_rebuild(df, gate_dir, auto_size=gate_auto_size),
            lambda df: bloom_accumulate(df, gate_dir),
        )
    return (
        lambda df: cms_rebuild(df, gate_dir, auto_size=gate_auto_size),
        lambda df: cms_accumulate(df, gate_dir),
    )


def _compact_layered_store(
    spark: SparkSession,
    store_dir: str,
    select_cols: list[str],
    bucket_col: str,
    n_buckets: int | None,
    target_rows_per_bucket: int | None,
    mode: str,
    max_layers: int,
    gate_rebuild,
    gate_accumulate,
) -> str:
    """The ONE leveled-compaction state machine both stores run
    (digest store and band store — r12 review: two hand-synced copies
    of pointer parsing / delta-vs-full arbitration / gate ordering /
    crash-window handling is how the copies diverge). ``select_cols``
    are the store's row columns; ``bucket_col`` is both the bucketing
    key and the gate key; the gate callbacks receive a one-column
    frame of it read back from the just-written layer (deterministic
    input, and always BEFORE the pointer swap — the superset-only
    crash-window ordering)."""
    import shutil

    old = _read_compact_pointer(store_dir)
    old_names, old_nb = old if old else (None, None)
    layers = old_names.split("+") if old_names else []
    batches = sorted(
        d for d in os.listdir(store_dir) if d.startswith("batch=")
    )
    if mode not in ("auto", "full", "delta"):
        raise ValueError(f"mode must be 'auto', 'full' or 'delta', got {mode!r}")
    # auto picks delta only when there is something to fold AND the
    # fold cannot need a re-bucket/resize; with no batches it falls
    # through to the full fold (pre-r12 semantics: an idle-period
    # maintenance call re-folds the base as a no-op rewrite instead of
    # raising — r12 review catch)
    do_delta = mode == "delta" or (
        mode == "auto"
        and bool(batches)
        and bool(layers)
        and old_nb is not None
        and n_buckets is None
        and target_rows_per_bucket is None
        and len(layers) < max_layers
    )
    if do_delta:
        if not layers or old_nb is None:
            raise RuntimeError(
                "delta compaction needs an existing bucketed base — "
                "run a full fold first"
            )
        if n_buckets is not None or target_rows_per_bucket is not None:
            raise ValueError("re-bucketing requires mode='full'")
        if not batches:
            raise RuntimeError(f"nothing to compact in {store_dir}")
        maxv = max(int(L.rsplit("_v", 1)[1]) for L in layers)
        delta = f"delta_v{maxv + 1}"
        # the delta layer is FLAT (no bucket partitioning): its size is
        # bounded by the compaction cadence — the L0 argument — while a
        # bucketed write would create one directory per bucket
        # (O(bucket count) file creations, and bucket count tracks the
        # CORPUS under target_rows_per_bucket: the first probe run
        # measured delta cost growing 4.8x across the stored decades
        # from exactly this). Readers bucket-prune base_* layers only
        # and read delta_* layers whole, like the batch dirs they fold.
        (
            spark.read.parquet(*[os.path.join(store_dir, b) for b in batches])
            .select(*select_cols)
            .write.mode("overwrite")
            .parquet(os.path.join(store_dir, delta))
        )
        if gate_accumulate is not None:
            # grow the gate by exactly the delta BEFORE the pointer
            # swap — additive counter merge / bit OR, O(delta) where
            # the full-fold rebuild is O(corpus)
            gate_accumulate(
                spark.read.parquet(os.path.join(store_dir, delta)).select(
                    bucket_col
                )
            )
        tmp = os.path.join(store_dir, _COMPACT + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"{'+'.join(layers + [delta])}|{old_nb}")
        os.replace(tmp, os.path.join(store_dir, _COMPACT))
        for b in batches:
            shutil.rmtree(os.path.join(store_dir, b), ignore_errors=True)
        return delta
    # ---- full fold: batches + every layer into one new base
    parts = list(batches) + layers
    if not parts:
        raise RuntimeError(f"nothing to compact in {store_dir}")
    # the (bucketed) layers and the (flat) batch directories have
    # conflicting partition structures — read them separately and union
    frames = []
    if batches:
        frames.append(
            spark.read.parquet(*[os.path.join(store_dir, b) for b in batches])
            .select(*select_cols)
        )
    for layer in layers:
        frames.append(
            spark.read.parquet(os.path.join(store_dir, layer)).select(*select_cols)
        )
    merged = frames[0]
    for f_ in frames[1:]:
        merged = merged.unionByName(f_)
    if n_buckets is None:
        if target_rows_per_bucket is not None:
            total = merged.count()
            nb = 1
            while nb * target_rows_per_bucket < total:
                nb *= 2
            n_buckets = nb
        else:
            n_buckets = old_nb or 64
    n = (
        max(int(L.rsplit("_v", 1)[1]) for L in layers) + 1 if layers else 0
    )
    new_base = f"base_v{n}"
    (
        merged.withColumn(_BKT, digest_bucket(bucket_col, n_buckets))
        # one exchange on the bucket id -> one file per bucket directory
        # (the sources/bucketed.py file-explosion lesson); task count is
        # capped — a task holding several buckets still writes one file
        # per bucket it holds
        .repartition(min(n_buckets, 256), _BKT)
        .write.partitionBy(_BKT)
        .mode("overwrite")
        .parquet(os.path.join(store_dir, new_base))
    )
    if gate_rebuild is not None:
        # rebuild the base gate BEFORE swapping the base pointer: the
        # gate must cover AT LEAST the base it serves — a crash between
        # rebuild and swap leaves the gate covering a superset (the
        # folded inputs are still readable), which only costs false
        # positives; the reverse order would leave a gate missing base
        # keys and silently duplicate the corpus.
        gate_rebuild(
            spark.read.parquet(os.path.join(store_dir, new_base)).select(
                bucket_col
            )
        )
    tmp = os.path.join(store_dir, _COMPACT + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{new_base}|{n_buckets}")
    os.replace(tmp, os.path.join(store_dir, _COMPACT))
    for p in parts:
        if p != new_base:
            shutil.rmtree(os.path.join(store_dir, p), ignore_errors=True)
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
    broadcast_cap: int = 1_000_000,
    neardup_dir: str | None = None,
    release_schema=None,
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
    the same discipline): batch M's L0 probe relies on batch N < M
    having committed its digest directory.

    ``neardup_dir`` (r12, VERDICT r11 item 2): an
    :func:`~waterdata_spark.streaming.neardup.init_neardup` store —
    exact-new documents that NEAR-duplicate anything already ingested
    are dropped too (the full ``dedup_against`` cascade; candidate
    reference text comes from the release itself, shard-pruned; pass
    ``release_schema`` so the JSONL fetch skips schema inference).
    Within-batch near-dups both land (the batch operator's semantics
    per batch) — run ``minhash_dedup`` in ``prepare`` to also dedup
    inside each batch. ``broadcast_cap`` bounds the candidate/band
    frames the membership probes may broadcast before falling back to
    distributed joins.

    Cross-corpus membership plan (r12 — the VERDICT r11 scan-floor
    fix; exact semantics — every stored duplicate is dropped, equality
    with the plain anti-join test-pinned). The stored digest set has
    two components with different physics, probed differently:

    - **L0** (per-batch directories since the last compaction): small
      and bounded by the compaction cadence — the WHOLE batch
      anti-joins it exactly (no gate, no pruning needed).
    - **compacted base** (the bulk of the corpus): the CMS gate —
      rebuilt at compaction time to cover exactly the base, and
      NEVER updated on the hot path (r12: the per-batch sketch
      merge+rewrite profiled as the largest per-batch term at sf10)
      — splits the L0 survivors into a pass-through sliver and the
      CANDIDATE sliver (true dups + the gate's false-positive rate).
      Only candidates consult the base, and that probe is (1) PRUNED
      to the candidates' ``digest_bucket`` partition directories (a
      bounded distinct-bucket collect decides which) and (2)
      SHUFFLE-FREE: the candidate digests broadcast into a semi-join
      against the pruned base (hits ≤ candidate count) and the hits
      broadcast back into the anti-join — the base is scanned once,
      candidate-bounded, and never exchanged. Above ``broadcast_cap``
      candidates the plan falls back to the plain distributed
      anti-join on the (still pruned) base.

    Correctness of the stale-between-compactions gate: the gate must
    cover AT LEAST the base it serves (false positives only cost the
    exact probe). :func:`compact_digests` rebuilds the gate from the
    new base content BEFORE swapping the base pointer, so at every
    instant gate-coverage ⊇ base; digests newer than the base live in
    L0, which is probed exactly."""
    from waterdata_spark.operators.sketches import count_min_might_contain
    from waterdata_spark.streaming.gates import read_gate

    spark = batch_df.sparkSession
    # ONE pointer read serves the gate table/filter AND the params it
    # was built with (r12 auto-size support: a compaction may RESIZE
    # the gate between batches; a params/table pair from two racing
    # reads could mix widths and produce false negatives)
    gate_kind, gate_obj, gate_params = read_gate(spark, gate_dir)
    if gate_params.get("seed") != "xgate":
        # the cms prefilter hashes with the fixed 'xgate' seed; a store
        # built under another seed cannot serve it
        raise ValueError(
            f"gate store seed {gate_params.get('seed')!r} != 'xgate' — "
            "init the ingest gate with the default seed"
        )
    # a saturated gate flags (nearly) everything "maybe" — probing it
    # costs the broadcast + hash evaluations and prunes nothing. Skip
    # it and let every L0 survivor be a candidate for the (bucket-
    # pruned, exact) base probe; membership semantics are unchanged.
    gate_useful = gate_params.get("est_fp", 0.0) < 0.9
    if prepare is not None:
        batch_df = prepare(batch_df)
    # the digest column ONCE, then within-batch dedup ON it — every
    # later step (dedup election, anti-join, gate, store, sketch)
    # rides the fixed-width digest; the text is never re-hashed
    # (content_digest's documented digest-once pattern). Persist:
    # several sub-steps consume this frame and the upstream (a
    # streaming batch) must evaluate deterministically across them
    # (the split-plan contract).
    keyed = exact_dedup(
        batch_df.withColumn(_DIGEST_COL, content_digest([text_col])),
        [],
        id_col,
        digest_col=_DIGEST_COL,
    ).persist()
    new = cands = nd_sig = exact_new = None
    try:
        # L0: exact anti-join against the recent per-batch directories
        l0 = _read_batch_digests(spark, digest_dir, exclude_batch=batch_id)
        after_l0 = keyed if l0 is None else keyed.join(
            l0, _DIGEST_COL, "left_anti"
        )
        state = _read_compact_pointer(digest_dir)
        if state is None:
            # no compacted base yet — L0 was the whole stored set
            new = after_l0.persist()
        else:
            if not gate_useful:
                flagged = after_l0.withColumn("__maybe", F.lit(True))
            elif gate_kind == "bloom":
                from waterdata_spark.operators.bloom import with_bloom_contains

                flagged = with_bloom_contains(
                    after_l0, _DIGEST_COL, gate_obj, out_col="__maybe"
                )
            else:
                flagged = count_min_might_contain(
                    gate_obj, after_l0, _DIGEST_COL,
                    gate_params["depth"], gate_params["width"], seed="xgate",
                    out_col="__maybe",
                )
            passed = flagged.filter(~F.col("__maybe")).drop("__maybe")
            cands = flagged.filter(F.col("__maybe")).drop("__maybe").persist()
            n_cand = cands.count()
            if n_cand == 0:
                # nothing flagged — every L0 survivor is new to the base
                new = after_l0.persist()
            else:
                buckets = None
                if state[1] is not None:
                    # bounded collect: at most min(n_cand, n_buckets) ints
                    buckets = [
                        r["b"]
                        for r in cands.select(
                            digest_bucket(_DIGEST_COL, state[1]).alias("b")
                        ).distinct().collect()
                    ]
                base = _read_base_digests(spark, digest_dir, buckets=buckets)
                if base is None:  # defensive: pointer raced away mid-batch
                    base = spark.createDataFrame([], f"{_DIGEST_COL} string")
                if n_cand <= broadcast_cap:
                    hits = base.join(
                        F.broadcast(cands.select(_DIGEST_COL)),
                        _DIGEST_COL,
                        "left_semi",
                    )
                    new = passed.unionByName(
                        cands.join(F.broadcast(hits), _DIGEST_COL, "left_anti")
                    ).persist()
                else:
                    new = passed.unionByName(
                        cands.join(base, _DIGEST_COL, "left_anti")
                    ).persist()
        if neardup_dir is not None:
            # optional NEAR-dup stage (r12, VERDICT r11 item 2): drop
            # exact-new documents that near-duplicate anything already
            # ingested, against the stream-maintained band store
            # (streaming/neardup.py — the full dedup_against cascade;
            # candidate reference text comes from the release itself,
            # shard-pruned). `new` is persisted, so the cascade's
            # multiple evaluations see one deterministic frame.
            from waterdata_spark.streaming.neardup import (
                _batch_signatures,
                _read_params as _nd_params,
                flag_near_stored,
            )

            # ONE minhash pass serves both the flagging cascade and the
            # survivors' band-store update (the probe measured the
            # signature pass as the largest batch-bounded term — paying
            # it twice per batch was 25% of the stage)
            nd_sig = _batch_signatures(
                new, _nd_params(neardup_dir), id_col, text_col
            ).persist()
            flagged = flag_near_stored(
                new,
                neardup_dir,
                release_dir,
                id_col=id_col,
                text_col=text_col,
                exclude_batch=batch_id,
                release_schema=release_schema,
                broadcast_cap=broadcast_cap,
                precomputed_sig=nd_sig,
            )
            exact_new = new
            new = new.join(flagged, id_col, "left_anti").persist()
            new.count()  # materialize off the persisted parent first
            # (exact_new also rides the finally cleanup — if the count
            # above throws, the rebound frame must not leak its cached
            # partitions in the long-lived streaming JVM; r12 review)
            exact_new.unpersist()
        n_new = new.count()
        # replay-after-compaction guard (ADVICE r11): if a maintenance
        # compaction folded this batch's digest directory into the base
        # between a crash and the stream restart, the recomputed
        # survivor set is empty while the manifest already records the
        # batch — overwriting batch=N with an empty frame would erase
        # the per-batch provenance for nothing (membership lives in the
        # base). Skip the digest/gate writes in exactly that state.
        import json as _json

        from waterdata_spark.sources.shards import MANIFEST

        with open(os.path.join(release_dir, MANIFEST)) as fh:
            already_applied = _json.load(fh).get("last_append_batch") == batch_id
        # release append: staged + manifest-pointer-guarded
        append_training_shards(
            new.drop(_DIGEST_COL), release_dir, batch_id=batch_id
        )
        if not (n_new == 0 and already_applied):
            # digest store: whole-batch-directory overwrite == idempotent.
            # NOTE (r12): the CMS gate is NOT touched here — it covers
            # the compacted base only and is rebuilt by compact_digests
            # (the sketch merge+rewrite was the largest profiled
            # per-batch term); this batch's digests are L0 until the
            # next compaction and are probed exactly.
            new.select(_DIGEST_COL).write.mode("overwrite").parquet(
                os.path.join(digest_dir, f"batch={batch_id}")
            )
            if neardup_dir is not None:
                # band store: whole-directory overwrite — the same
                # idempotence as the digest store (its gate is a
                # compaction-time artifact too). Survivor signatures
                # come from the shared pass above.
                from waterdata_spark.streaming.neardup import neardup_store_batch

                neardup_store_batch(
                    new, batch_id, neardup_dir,
                    id_col=id_col, text_col=text_col,
                    precomputed_sig=nd_sig,
                )
    finally:
        for frame in (new, cands, keyed, nd_sig, exact_new):
            if frame is not None:
                frame.unpersist()
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
