"""Streaming membership-GATE maintenance (VERDICT r10 item 4): keep
the cross-corpus dedup gates — the count-min counter table and the
Bloom bit filter (``operators/sketches``, ``operators/bloom``) —
current as shards ingest, with the same exactly-once guarantee
``streaming/profile.py`` gives the HLL profile.

Both gates are mergeable by design (counters sum; bits OR), so the
per-micro-batch update is: build the batch's sketch, merge into the
stored one, publish a new version, atomically swap a pointer carrying
``(version, batch_id)``. A replayed batch (checkpoint recovery) sees
its own batch id on the pointer and no-ops — without the guard the
ADDITIVE merge would double-count counters (the CMS estimate would
drift high; the Bloom OR is idempotent, but the pointer keeps the two
stores' replay semantics identical and versions monotonic). The
pointer contract is profile.py's: one checkpoint lineage per store —
keep the checkpoint directory for the life of the gate.

Storage: the CMS store is versioned parquet (the counter TABLE — the
engine-reproducible row form); the Bloom store is a versioned bytes
file plus a params sidecar (the filter is driver-bounded ≤ 32 MB by
the bloom module's ``_MAX_BITS`` ceiling). Build parameters (depth/
width/seed; n_bits/k/seed) are RECORDED at init and re-read per batch,
so every update sketches with the stored configuration — a caller
cannot silently merge mismatched sketches.

Serving: :func:`read_cms` / :func:`read_bloom` feed
``dedup_against_exact(prefilter='cms'|'bloom', prefilter_cms=...|
prefilter_bloom=...)`` — the gate the stream maintains is exactly the
gate the batch dedup consumes (stream-of-batches == whole-corpus
equality is test-pinned BIT-identically: counter sums and bit ORs are
associative, unlike the HLL estimate's documented sparse/dense
non-identity).

Reference parity: no counterpart in the reference engine; X1/X6/X8
extension surface (SURVEY §2.9).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from waterdata_spark.operators.bloom import BloomFilter, bloom_build, bloom_merge
from waterdata_spark.operators.sketches import count_min_build, count_min_merge
from waterdata_spark.streaming.profile import _POINTER, _read_pointer

__all__ = [
    "init_cms_store",
    "read_cms",
    "read_gate",
    "cms_accumulate",
    "cms_batch",
    "cms_rebuild",
    "cms_stream_sink",
    "init_bloom_store",
    "read_bloom",
    "bloom_accumulate",
    "bloom_batch",
    "bloom_rebuild",
    "bloom_stream_sink",
]

_PARAMS = "_PARAMS.json"


def _write_pointer(table_dir: str, version: str, batch_id: int) -> None:
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(f"{version}|{batch_id}")
    os.replace(tmp, os.path.join(table_dir, _POINTER))


def _write_params(table_dir: str, params: dict) -> None:
    tmp = os.path.join(table_dir, _PARAMS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(params, f, sort_keys=True)
    os.replace(tmp, os.path.join(table_dir, _PARAMS))


def _read_params(table_dir: str) -> dict:
    with open(os.path.join(table_dir, _PARAMS)) as f:
        return json.load(f)


def _write_version_params(table_dir: str, version: str, params: dict) -> None:
    """Per-VERSION params sidecar (r12 auto-size support): once the
    rebuild path may change a gate's width/n_bits, the build parameters
    must ride WITH the version the pointer names — a reader that took
    params from the store-level file and the table from the pointer
    could pair a resized width with an old table across the swap, and a
    width mismatch produces false NEGATIVES (silent corpus
    duplication). A version's sidecar is written BEFORE the pointer
    ever names it and never mutated, so pointer → sidecar is always a
    consistent pair."""
    tmp = os.path.join(table_dir, f"{version}.params.json.tmp")
    with open(tmp, "w") as f:
        json.dump(params, f, sort_keys=True)
    os.replace(tmp, os.path.join(table_dir, f"{version}.params.json"))


def _params_for(table_dir: str, version: str) -> dict:
    """The params the named version was BUILT with — its sidecar, or
    the store-level file for pre-sidecar legacy versions (those all
    share the init-time config: nothing could have resized them)."""
    p = os.path.join(table_dir, f"{version}.params.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return _read_params(table_dir)


def _prune_versions(
    table_dir: str, keep: int = 2, min_age_sec: float = 600.0
) -> None:
    """Remove superseded gate versions, keeping the newest ``keep``
    AND any version younger than ``min_age_sec`` (by mtime). Unlike
    the low-frequency profile store, the gates update per MICRO-BATCH
    on the hot ingest path — without pruning a long-running stream
    keeps every full copy of the counter table / bit file forever
    (r11 review catch).

    Why the age grace and not just a generation count (ADVICE r11):
    ``read_cms`` returns a LAZY frame over the pointed-at version —
    a long batch job (e.g. a ``dedup_against_exact`` serving run
    concurrent with the hot stream) can still be scanning v{n} many
    micro-batches after the pointer moved on, and a count-based
    grace of one generation would delete the directory mid-scan. The
    age floor gives such readers ``min_age_sec`` to finish or
    persist; jobs expected to run longer than that must
    ``persist()``/materialize the gate frame immediately after
    ``read_cms`` (documented there). Safe because all readers go
    through the pointer (the module contract) and the store is
    single-writer."""
    import re
    import shutil
    import time

    entries = []
    for name in os.listdir(table_dir):
        m = re.fullmatch(r"v(\d+)(\.bits)?", name)
        if m:
            entries.append((int(m.group(1)), name))
    now = time.time()
    for _, name in sorted(entries)[:-keep]:
        path = os.path.join(table_dir, name)
        try:
            if now - os.path.getmtime(path) < min_age_sec:
                continue  # a lazy reader may still hold a reference
        except OSError:
            continue
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        try:  # the pruned version's params sidecar goes with it
            os.remove(os.path.join(table_dir, f"{name}.params.json"))
        except FileNotFoundError:
            pass


# ---------------------------------------------------------------- CMS


def init_cms_store(
    df: DataFrame,
    table_dir: str,
    col: str,
    depth: int = 4,
    width: int = 1 << 20,
    seed: str = "xgate",
) -> None:
    """Seed version 0 from a (possibly empty) frame — e.g. the digest
    column of the corpus as of stream start, or ``df.limit(0)`` for an
    empty gate. ``seed`` defaults to ``'xgate'`` — the seed
    ``dedup_against_exact``'s cms prefilter hashes with, so the stored
    gate serves it directly."""
    os.makedirs(table_dir, exist_ok=True)
    p = {"kind": "cms", "col": col, "depth": depth, "width": width, "seed": seed}
    _write_params(table_dir, p)
    sk = count_min_build(df, col, depth=depth, width=width, seed=seed)
    sk.write.mode("overwrite").parquet(os.path.join(table_dir, "v0"))
    _write_version_params(table_dir, "v0", p)
    _write_pointer(table_dir, "v0", -1)


def read_cms(spark: SparkSession, table_dir: str) -> DataFrame:
    """The stored counter table (``d, bucket, cnt``) — pass as
    ``prefilter_cms`` (with the stored params) to the batch gate.

    The frame is LAZY over the pointed-at version directory. A serving
    job running concurrently with the hot ingest stream has
    ``prune_min_age_sec`` (default 10 min) before the writer may prune
    that version out from under it — a job that can run longer must
    ``persist()`` + materialize the frame immediately after this call,
    or the writer must raise its prune knobs (ADVICE r11)."""
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"cms store not initialized: {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, state[0]))


def read_gate(spark: SparkSession, table_dir: str):
    """One-pointer-read serve of EITHER gate kind as a consistent
    ``(kind, gate, params)`` triple: ``('cms', DataFrame, params)`` or
    ``('bloom', BloomFilter, params)``, with ``params`` the exact
    build config of the version served (its sidecar — see
    :func:`_write_version_params`). This is the reader the hot ingest
    paths use (r12): probing a counter table with a different width
    than it was built with looks up absent buckets and silently
    flags every stored digest "definitely new", so the table and its
    params must come from ONE pointer read, not two racing file
    reads. ``params`` may carry ``est_fp`` — the rebuild-time
    estimated false-positive rate — which serving paths use to skip a
    saturated gate's pure overhead."""
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"gate store not initialized: {table_dir}")
    version = state[0]
    p = _params_for(table_dir, version)
    if p.get("kind") == "bloom":
        with open(os.path.join(table_dir, version), "rb") as f:
            raw = f.read()
        return "bloom", BloomFilter.from_bytes(raw, p["n_bits"], p["k"], p["seed"]), p
    return "cms", spark.read.parquet(os.path.join(table_dir, version)), p


def cms_batch(
    batch_df: DataFrame,
    table_dir: str,
    batch_id: int,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
) -> str | None:
    """One merge step (the foreachBatch body, callable directly — the
    replay test does). Returns the new version, or None when
    ``batch_id`` was already applied (checkpoint-replay no-op). The
    batch sketches with the STORED (col, depth, width, seed).
    ``prune_keep``/``prune_min_age_sec`` pass to
    :func:`_prune_versions` — raise them when long-running serving
    jobs read the store lazily (ADVICE r11)."""
    spark = batch_df.sparkSession
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"cms store not initialized: {table_dir} (call init_cms_store)")
    version, last_batch = state
    if batch_id == last_batch:
        return None
    # the POINTED version's build params (r12): the batch sketch must
    # be built at the stored table's width — merging mismatched widths
    # would sum unrelated buckets silently
    p = _params_for(table_dir, version)
    stored = spark.read.parquet(os.path.join(table_dir, version))
    fresh = count_min_build(
        batch_df, p["col"], depth=p["depth"], width=p["width"], seed=p["seed"]
    )
    merged = count_min_merge(stored, fresh)
    next_version = f"v{int(version.lstrip('v')) + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, next_version))
    # the merged table has MORE keys than the last rebuild measured —
    # its est_fp/n_keys no longer hold, so don't carry them forward
    p = {k: v for k, v in p.items() if k not in ("est_fp", "n_keys")}
    _write_version_params(table_dir, next_version, p)
    _write_pointer(table_dir, next_version, batch_id)
    _prune_versions(table_dir, keep=prune_keep, min_age_sec=prune_min_age_sec)
    return next_version


def cms_rebuild(
    df: DataFrame,
    table_dir: str,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
    auto_size: bool = False,
    target_fill: float = 0.3,
    max_width: int = 1 << 24,
) -> str:
    """REPLACE the stored counter table with a fresh build over ``df``
    (stored params — col/depth/seed are re-read, a caller cannot
    rebuild with a mismatched config). The maintenance-time companion
    to :func:`cms_batch` (r12): a store that serves as a
    COMPACTED-BASE gate is rebuilt here at compaction time, off the
    per-batch hot path — the hot path then never pays the
    sketch-table merge+rewrite (profiled at sf10 as the largest
    per-batch term). New version, atomic pointer swap; the pointer's
    batch id is preserved (rebuilds are maintenance actions outside
    the batch lineage). Callers sequencing a base swap must rebuild
    the gate FIRST — a gate briefly covering a superset only costs
    false positives; covering a subset would silently duplicate.

    ``auto_size`` (r12): a rebuild sees the WHOLE set it will gate, so
    it is the natural place to keep the gate sized to the corpus
    instead of making the operator guess at init time (the neardup
    at-birth probe's saturated-gate lesson: a 1M-width gate over 2M
    stored band hashes flags every probe "maybe" — pure overhead).
    Counts distinct keys and GROWS ``width`` (powers of two, capped at
    ``max_width``) until ``n_keys <= width * target_fill``; never
    shrinks (a wider-than-needed gate only wastes the bounded
    broadcast). The new width rides the new version's params sidecar
    (see :func:`_write_version_params`), so every reader pairs it with
    the resized table atomically; a probe BUILT at the old width
    against the new table is impossible through :func:`read_gate`.

    Every rebuild also records ``est_fp`` in the sidecar — the
    estimated false-positive rate ``(nonzero_counters / (depth *
    width)) ** depth`` — which serving paths use to BYPASS a saturated
    gate (probing a gate that flags everything costs the probe and
    saves nothing). At the ``max_width`` cap the gate saturates
    honestly: est_fp → 1, the bypass disengages it, and the
    bucket-pruned exact probe carries membership alone."""
    spark = df.sparkSession
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"cms store not initialized: {table_dir} (call init_cms_store)")
    version, last_batch = state
    p = _params_for(table_dir, version)
    if not os.path.exists(os.path.join(table_dir, f"{version}.params.json")):
        # legacy pre-sidecar version: pin its build params before the
        # store-level default below may move to a resized width — a
        # concurrent lazy reader of this version must keep resolving
        # the params it was built with
        _write_version_params(table_dir, version, p)
    p.pop("est_fp", None)
    p.pop("n_keys", None)
    if auto_size:
        n_keys = df.select(p["col"]).distinct().count()
        width = p["width"]
        while n_keys > width * target_fill and width < max_width:
            width *= 2
        if width != p["width"]:
            p = {**p, "width": width}
        p["n_keys"] = n_keys
    sk = count_min_build(df, p["col"], depth=p["depth"], width=p["width"], seed=p["seed"])
    next_version = f"v{int(version.lstrip('v')) + 1}"
    sk.write.mode("overwrite").parquet(os.path.join(table_dir, next_version))
    # fill from the WRITTEN table (one bounded count of <= depth*width
    # rows, maintenance-time): the per-probe pass rate for an absent
    # key is ~ the fraction of nonzero counters, independent per depth
    # row under the pairwise-independent hash assumption
    nz = spark.read.parquet(os.path.join(table_dir, next_version)).count()
    fill = nz / float(p["depth"] * p["width"])
    p["est_fp"] = round(min(1.0, fill) ** p["depth"], 6)
    _write_version_params(table_dir, next_version, p)
    _write_params(table_dir, p)  # keep the store-level default current
    _write_pointer(table_dir, next_version, last_batch)
    _prune_versions(table_dir, keep=prune_keep, min_age_sec=prune_min_age_sec)
    return next_version


def cms_accumulate(
    df: DataFrame,
    table_dir: str,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
) -> str:
    """MERGE ``df``'s sketch into the stored table (maintenance-time,
    r12 leveled compaction): when a compaction folds only the NEW batch
    directories into a delta layer, the gate must grow by exactly that
    delta — counters are additive, so the merge is O(delta), not
    O(corpus) like :func:`cms_rebuild`. Built at the POINTED version's
    params (a delta can never resize — only a full rebuild can).
    ``est_fp`` is re-measured from the merged table's row count.

    No batch-id guard: this is a single-writer maintenance action (the
    compaction lock). A crash between this merge and the compaction's
    pointer swap, then a re-run, double-counts the delta's keys — the
    membership reading (counter >= 1) is unaffected (still no false
    negatives, coverage stays a superset), which is the same
    duplicate-set-rows tolerance the compaction's data path has."""
    spark = df.sparkSession
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"cms store not initialized: {table_dir} (call init_cms_store)")
    version, last_batch = state
    p = _params_for(table_dir, version)
    p.pop("est_fp", None)
    p.pop("n_keys", None)
    stored = spark.read.parquet(os.path.join(table_dir, version))
    fresh = count_min_build(
        df, p["col"], depth=p["depth"], width=p["width"], seed=p["seed"]
    )
    merged = count_min_merge(stored, fresh)
    next_version = f"v{int(version.lstrip('v')) + 1}"
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, next_version))
    nz = spark.read.parquet(os.path.join(table_dir, next_version)).count()
    fill = nz / float(p["depth"] * p["width"])
    p["est_fp"] = round(min(1.0, fill) ** p["depth"], 6)
    _write_version_params(table_dir, next_version, p)
    _write_pointer(table_dir, next_version, last_batch)
    _prune_versions(table_dir, keep=prune_keep, min_age_sec=prune_min_age_sec)
    return next_version


def cms_stream_sink(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
):
    """Start an ``availableNow`` foreachBatch query maintaining the
    stored CMS gate from an ingest stream (the stream's rows carry the
    stored ``col``). Returns the StreamingQuery (caller awaits).

    Prune knobs pass through to :func:`_prune_versions` (r12 review):
    at a fast trigger cadence the default 10-minute age grace retains
    ~``min_age / trigger_interval`` full counter-table copies — a
    5-second trigger keeps ~120. Lower ``prune_min_age_sec`` when no
    long-running lazy reader serves from this store, or accept the
    retention as the price of concurrent serving jobs."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        cms_batch(
            batch_df,
            table_dir,
            batch_id,
            prune_keep=prune_keep,
            prune_min_age_sec=prune_min_age_sec,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# -------------------------------------------------------------- Bloom


def init_bloom_store(
    df: DataFrame,
    table_dir: str,
    col: str,
    n_bits: int = 1 << 23,
    k: int = 4,
    seed: str = "xgate",
) -> None:
    """Seed version 0. ``seed`` defaults to ``'xgate'`` so the stored
    filter serves ``dedup_against_exact(prefilter='bloom',
    prefilter_bloom=read_bloom(...))`` directly."""
    os.makedirs(table_dir, exist_ok=True)
    p = {"kind": "bloom", "col": col, "n_bits": n_bits, "k": k, "seed": seed}
    _write_params(table_dir, p)
    bf = bloom_build(df, col, n_bits=n_bits, k=k, seed=seed)
    with open(os.path.join(table_dir, "v0.bits"), "wb") as f:
        f.write(bf.to_bytes())
    _write_version_params(table_dir, "v0.bits", p)
    _write_pointer(table_dir, "v0.bits", -1)


def read_bloom(table_dir: str) -> BloomFilter:
    """The stored filter — pass as ``prefilter_bloom``. Parameters come
    from the pointed VERSION's sidecar (r12), so a rebuild-time resize
    can never pair old bits with a new n_bits."""
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(f"bloom store not initialized: {table_dir}")
    p = _params_for(table_dir, state[0])
    with open(os.path.join(table_dir, state[0]), "rb") as f:
        raw = f.read()
    return BloomFilter.from_bytes(raw, p["n_bits"], p["k"], p["seed"])


def bloom_batch(
    batch_df: DataFrame,
    table_dir: str,
    batch_id: int,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
) -> str | None:
    """One OR-merge step; None when ``batch_id`` was already applied.
    (The OR itself is idempotent — the guard keeps versions monotonic
    and the replay contract identical to the CMS/profile stores.)
    Prune knobs as in :func:`cms_batch`."""
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(
            f"bloom store not initialized: {table_dir} (call init_bloom_store)"
        )
    version, last_batch = state
    if batch_id == last_batch:
        return None
    # pointed version's params: the OR-merge must match the stored
    # filter's n_bits (mismatched lengths raise in from_bytes; this
    # keeps the pair consistent by construction)
    p = _params_for(table_dir, version)
    stored = read_bloom(table_dir)
    fresh = bloom_build(
        batch_df, p["col"], n_bits=p["n_bits"], k=p["k"], seed=p["seed"]
    )
    merged = bloom_merge(stored, fresh)
    n = int(version.split(".")[0].lstrip("v")) + 1
    next_version = f"v{n}.bits"
    with open(os.path.join(table_dir, next_version), "wb") as f:
        f.write(merged.to_bytes())
    # merged filter holds more keys than the last rebuild's estimate
    p = {k: v for k, v in p.items() if k not in ("est_fp", "n_keys")}
    _write_version_params(table_dir, next_version, p)
    _write_pointer(table_dir, next_version, batch_id)
    _prune_versions(table_dir, keep=prune_keep, min_age_sec=prune_min_age_sec)
    return next_version


def bloom_rebuild(
    df: DataFrame,
    table_dir: str,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
    auto_size: bool = False,
    target_fp: float = 0.01,
) -> str:
    """REPLACE the stored filter with a fresh build over ``df`` (stored
    params) — :func:`cms_rebuild`'s Bloom twin, for stores serving as
    compacted-base gates rebuilt at compaction time off the per-batch
    hot path. Same superset-ordering contract: callers sequencing a
    base swap must rebuild the gate first.

    ``auto_size`` (r12, :func:`cms_rebuild`'s contract): grow
    ``n_bits`` (powers of two, capped at the bloom module's driver
    ceiling) until the predicted rate ``(1 - e^(-k*n/m))^k`` meets
    ``target_fp``; never shrinks. The new size rides the version's
    params sidecar; ``est_fp`` (from the BUILT filter's fill fraction)
    is recorded either way, and serving paths bypass a saturated gate.
    At the bit ceiling (≤ 32 MB driver-side) the filter saturates
    honestly around a few tens of millions of keys — past that the
    bypass disengages it and the bucket-pruned exact probe carries
    membership alone."""
    import math

    from waterdata_spark.operators.bloom import _MAX_BITS

    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(
            f"bloom store not initialized: {table_dir} (call init_bloom_store)"
        )
    version, last_batch = state
    p = _params_for(table_dir, version)
    if not os.path.exists(os.path.join(table_dir, f"{version}.params.json")):
        _write_version_params(table_dir, version, p)  # legacy pin (see cms_rebuild)
    p.pop("est_fp", None)
    p.pop("n_keys", None)
    if auto_size:
        n_keys = df.select(p["col"]).distinct().count()
        n_bits = p["n_bits"]
        while (
            n_bits < _MAX_BITS
            and n_keys
            and (1.0 - math.exp(-p["k"] * n_keys / n_bits)) ** p["k"] > target_fp
        ):
            # clamp: a non-power-of-two start (e.g. 3<<26) would double
            # past the ceiling and bloom_build would raise, failing
            # every subsequent compaction (r12 review catch)
            n_bits = min(n_bits * 2, _MAX_BITS)
        if n_bits != p["n_bits"]:
            p = {**p, "n_bits": n_bits}
        p["n_keys"] = n_keys
    bf = bloom_build(df, p["col"], n_bits=p["n_bits"], k=p["k"], seed=p["seed"])
    p["est_fp"] = round(bf.fill_fraction ** p["k"], 6)
    n = int(version.split(".")[0].lstrip("v")) + 1
    next_version = f"v{n}.bits"
    with open(os.path.join(table_dir, next_version), "wb") as f:
        f.write(bf.to_bytes())
    _write_version_params(table_dir, next_version, p)
    _write_params(table_dir, p)  # keep the store-level default current
    _write_pointer(table_dir, next_version, last_batch)
    _prune_versions(table_dir, keep=prune_keep, min_age_sec=prune_min_age_sec)
    return next_version


def bloom_accumulate(
    df: DataFrame,
    table_dir: str,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
) -> str:
    """OR-merge ``df``'s filter into the stored one —
    :func:`cms_accumulate`'s Bloom twin for delta compactions (the OR
    is idempotent, so the crash-rerun window is trivially safe).
    ``est_fp`` re-measured from the merged filter's fill."""
    state = _read_pointer(table_dir)
    if state is None:
        raise RuntimeError(
            f"bloom store not initialized: {table_dir} (call init_bloom_store)"
        )
    version, last_batch = state
    p = _params_for(table_dir, version)
    p.pop("est_fp", None)
    p.pop("n_keys", None)
    stored = read_bloom(table_dir)
    fresh = bloom_build(
        df, p["col"], n_bits=p["n_bits"], k=p["k"], seed=p["seed"]
    )
    merged = bloom_merge(stored, fresh)
    p["est_fp"] = round(merged.fill_fraction ** p["k"], 6)
    n = int(version.split(".")[0].lstrip("v")) + 1
    next_version = f"v{n}.bits"
    with open(os.path.join(table_dir, next_version), "wb") as f:
        f.write(merged.to_bytes())
    _write_version_params(table_dir, next_version, p)
    _write_pointer(table_dir, next_version, last_batch)
    _prune_versions(table_dir, keep=prune_keep, min_age_sec=prune_min_age_sec)
    return next_version


def bloom_stream_sink(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    prune_keep: int = 2,
    prune_min_age_sec: float = 600.0,
):
    """Start an ``availableNow`` foreachBatch query maintaining the
    stored Bloom gate from an ingest stream. Prune knobs as in
    :func:`cms_stream_sink` (a fast trigger cadence retains
    ~``min_age / trigger_interval`` full bit-file copies under the
    default age grace)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        bloom_batch(
            batch_df,
            table_dir,
            batch_id,
            prune_keep=prune_keep,
            prune_min_age_sec=prune_min_age_sec,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
