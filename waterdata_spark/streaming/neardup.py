"""Stream-MAINTAINED near-duplicate membership (VERDICT r11 item 2):
the fuzzy sibling of the exact digest store — a MinHash BAND store
kept current as batches ingest, so a live release can drop documents
that NEAR-duplicate anything already ingested (RefinedWeb §3.2 dedups
fuzzily at ingest; ``streaming/hygiene.dedup_against_stream_sink``
only serves a reference FROZEN at stream-definition time).

Decision semantics are EXACTLY ``dedup_approx.dedup_against``'s
cascade (stream-of-batches == iterated batch ``dedup_against`` on the
accumulated corpus, row for row — test-pinned):

1. band collision: the batch's (band_id, band_hash) rows against the
   stored band rows — fixed-width keys, never text;
2. signature-estimate prefilter: pair Jaccard estimated from the
   n_hashes minhash values, pairs below threshold - margin skipped;
3. exact shingle Jaccard >= threshold on the survivors.

Band rows CARRY the document's signature array, so stage 2 runs
directly on the band-collision output — no text, no fetch (the probe's
first run measured 1.3M collision pairs from hot band buckets at 500k
stored docs; estimating BEFORE any text access is what makes hot
buckets survivable, exactly as in the batch operator). Only stage 3
needs the REFERENCE TEXT, which this store deliberately does not
duplicate — the release already holds it, the estimate-surviving pair
set is small, and the fetch is a SHARD-PRUNED release read
(deterministic hash assignment -> the candidate ids' shards are
computable driver-side) plus a semi-join.

Store layout — the r12 digest-store architecture transplanted:

- per-batch directories ``batch=N/`` of band rows
  ``(__rid, band_id, band_hash, __sig)`` (4 fixed-width rows/doc at
  the default config, each carrying the n_hashes-value signature),
  rewritten whole on replay (idempotent overwrite);
- :func:`compact_bands` folds them into a base BUCKETED on the band
  hash (``digest_bucket`` of ``band_hash``), bucket count on the
  atomic pointer, so the per-batch collision probe prunes its scan to
  the batch's band buckets instead of reading every stored band row;
- an optional CMS gate over ``band_hash`` (``streaming/gates``, the
  same (version, batch_id) replay guard) bounds WHICH batch band rows
  consult the store at all: a band hash the gate has never seen
  cannot collide (no false negatives — sketches.py contract), so at
  low duplication rates the probe is gate-flagged-sliver-bounded.

Single writer per store, batches applied in order, one checkpoint per
lineage — the ``streaming/ingest`` contracts. Composition into the
live-release path: ``ingest_batch(neardup_dir=...)``.

Reference parity: no counterpart in the reference engine; the
streaming composition of X2 (fuzzy dedup) — SURVEY §2.9.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup_approx import (
    _bands_from_signature,
    _hashed_shingle_array,
    minhash_signature_frame,
)
from waterdata_spark.streaming.ingest import _read_compact_pointer, digest_bucket

__all__ = [
    "compact_bands",
    "flag_near_stored",
    "init_neardup",
    "neardup_store_batch",
    "read_bands",
]

_PARAMS = "_PARAMS.json"
_COMPACT = "_COMPACT"
_BKT = "__bkt"


def init_neardup(
    spark: SparkSession,
    store_dir: str,
    gate_dir: str | None = None,
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 8,
    hash_fn: str = "xx",
    threshold: float = 0.7,
    prefilter_margin: float = 0.25,
    cms_depth: int = 4,
    cms_width: int = 1 << 20,
    id_type: str = "long",
) -> None:
    """Create an empty band store; parameters are RECORDED here and
    re-read per batch (the gates.py discipline — a caller cannot
    silently band with a mismatched config). ``gate_dir`` additionally
    seeds an empty CMS gate over the band hashes. ``id_type`` is the
    release id column's Spark type name — ``__rid`` stores the raw id
    value, and :func:`read_bands` must shape its EMPTY-store frame
    with the same type or a union/join against later reads
    type-mismatches (r12 review catch for string-id releases)."""
    os.makedirs(store_dir, exist_ok=True)
    with open(os.path.join(store_dir, _PARAMS), "w") as f:
        json.dump(
            {
                "kind": "minhash_bands",
                "n_hashes": n_hashes,
                "n_bands": n_bands,
                "k": k,
                "hash_fn": hash_fn,
                "threshold": threshold,
                "prefilter_margin": prefilter_margin,
                "gate_dir": gate_dir,
                "id_type": id_type,
            },
            f,
            sort_keys=True,
        )
    if gate_dir is not None:
        from waterdata_spark.streaming.gates import init_cms_store

        init_cms_store(
            spark.createDataFrame([], "band_hash string"),
            gate_dir,
            "band_hash",
            depth=cms_depth,
            width=cms_width,
        )


def _read_params(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _PARAMS)) as f:
        return json.load(f)


def read_bands(
    spark: SparkSession,
    store_dir: str,
    exclude_batch: int | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """The stored band rows ``(__rid, band_id, band_hash, __sig)``:
    compacted base plus per-batch directories. ``exclude_batch`` / ``buckets``
    have exactly the ``ingest.read_digests`` semantics: the replay
    guard, and band-hash-bucket pruning of the compacted base (batch
    dirs always read whole — the LSM L0 discipline)."""
    frames = []
    l0 = _read_batch_bands(spark, store_dir, exclude_batch)
    if l0 is not None:
        frames.append(l0)
    base = _read_base_bands(spark, store_dir, buckets)
    if base is not None:
        frames.append(base)
    if not frames:
        p = _read_params(store_dir)
        sig_t = "bigint" if p["hash_fn"] == "xx" else "string"
        rid_t = p.get("id_type", "long")
        return spark.createDataFrame(
            [],
            f"__rid {rid_t}, band_id int, band_hash string, __sig array<{sig_t}>",
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


_COLS = ["__rid", "band_id", "band_hash", "__sig"]


def _read_batch_bands(
    spark: SparkSession, store_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    parts = [
        d
        for d in os.listdir(store_dir)
        if d.startswith("batch=") and d != f"batch={exclude_batch}"
    ]
    if not parts:
        return None
    return spark.read.parquet(
        *[os.path.join(store_dir, b) for b in parts]
    ).select(*_COLS)


def _read_base_bands(
    spark: SparkSession, store_dir: str, buckets: list[int] | None = None
) -> DataFrame | None:
    """Union of the pointer's layers (base + any delta layers — the
    r12 leveled-compaction layout, see ``ingest.compact_digests``),
    bucket-pruned per layer."""
    state = _read_compact_pointer(store_dir)
    if state is None:
        return None
    names, n_buckets = state
    frames = []
    for name in names.split("+"):
        bdf = spark.read.parquet(os.path.join(store_dir, name))
        if (
            not name.startswith("delta_")  # flat deltas read whole
            and n_buckets is not None
            and buckets is not None
        ):
            if not buckets:
                continue
            bdf = bdf.filter(F.col(_BKT).isin([int(b) for b in buckets]))
        frames.append(bdf.select(*_COLS))
    if not frames:
        return None
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def compact_bands(
    spark: SparkSession,
    store_dir: str,
    n_buckets: int | None = None,
    target_rows_per_bucket: int | None = None,
    gate_auto_size: bool = True,
    mode: str = "auto",
    max_layers: int = 4,
) -> str:
    """Fold per-batch band directories into a base bucketed on the
    band hash — a thin wrapper over ``ingest._compact_layered_store``
    (ONE leveled-compaction state machine for both stores; r12 review:
    two hand-synced copies is how they diverge), with this store's
    columns and its CMS gate over ``band_hash``. Same pointer/crash/
    re-bucketing contract as ``ingest.compact_digests`` (run
    single-writer, never between a crash and the stream's restart).

    ``gate_auto_size`` (r12): the full fold's gate rebuild re-sizes
    the CMS to the base's distinct band hashes and records ``est_fp``
    — the at-birth probe's saturated-gate term (a 1M-width gate over
    2M stored band hashes flagged every batch band "maybe")
    self-heals at the next full fold instead of requiring the
    operator to re-init with a bigger width; ``mode='auto'`` folds
    only the batch directories into a FLAT ``delta_vN`` layer (gate
    grown by the additive ``cms_accumulate`` merge; O(newly
    ingested)) while an existing bucketed base has fewer than
    ``max_layers`` layers and no re-bucketing argument is given,
    escalating to the full O(corpus) fold otherwise."""
    from waterdata_spark.streaming.ingest import (
        _compact_layered_store,
        _gate_fns,
    )

    gate_dir = _read_params(store_dir).get("gate_dir")
    rebuild_fn, accum_fn = _gate_fns(gate_dir, gate_auto_size)
    return _compact_layered_store(
        spark,
        store_dir,
        select_cols=_COLS,
        bucket_col="band_hash",
        n_buckets=n_buckets,
        target_rows_per_bucket=target_rows_per_bucket,
        mode=mode,
        max_layers=max_layers,
        gate_rebuild=rebuild_fn,
        gate_accumulate=accum_fn,
    )


def _batch_signatures(
    batch_df: DataFrame, p: dict, id_col: str, text_col: str
) -> DataFrame:
    return minhash_signature_frame(
        batch_df.select(id_col, text_col),
        id_col,
        text_col,
        p["n_hashes"],
        p["k"],
        p["hash_fn"],
    )


def flag_near_stored(
    batch_df: DataFrame,
    store_dir: str,
    release_dir: str | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_batch: int | None = None,
    release_schema=None,
    broadcast_cap: int = 1_000_000,
    exact_verify: bool = True,
    precomputed_sig: DataFrame | None = None,
) -> DataFrame:
    """Ids of ``batch_df`` documents that NEAR-duplicate any stored
    document — the full ``dedup_against`` cascade against the
    maintained store (band collision -> estimate prefilter -> exact
    shingle Jaccard), equal to the batch operator row for row.

    Plan: batch signatures once (persisted); batch band rows gate
    through the store's CMS (if configured) so unseen band hashes
    never consult the store; the surviving band rows' buckets prune
    the compacted base; collisions broadcast-join (bounded by the
    flagged sliver, ``broadcast_cap`` guards the assumption — above
    it the probe falls back to the distributed join); stage-3 text
    for the candidate reference ids comes from a SHARD-PRUNED release
    read. Returns a one-column ``(id_col)`` frame.

    ``batch_df`` is evaluated multiple times across the cascade —
    the caller must pass a deterministic (persisted) frame (the
    split-plan contract; ``ingest_batch`` does).

    ``exact_verify=False`` (r12): decide from SIGNATURES alone — band
    collision AND estimated Jaccard >= the FULL threshold (the
    ``flag_near_reference`` / production trade: trust the sketch,
    est-noise sigma = sqrt(j(1-j)/n_hashes)), so the release is never
    read on the hot path (``release_dir`` may be None). Cheaper;
    false drops bounded by the estimator's noise rather than raw band
    collisions. Keep the default cascade when every document
    matters."""
    from waterdata_spark.sources.shards import (
        MANIFEST,
        read_training_shards,
        with_shard,
    )

    spark = batch_df.sparkSession
    p = _read_params(store_dir)
    n_hashes, n_bands = p["n_hashes"], p["n_bands"]
    own_sig = precomputed_sig is None
    csig = (
        _batch_signatures(batch_df, p, id_col, text_col).persist()
        if own_sig
        else precomputed_sig
    )
    cb = gb = pairs = ref = None
    try:
        cb = _bands_from_signature(
            csig, id_col, n_hashes, n_bands, p["hash_fn"]
        ).persist()
        n_cb = cb.count()  # bounded: n_bands x batch rows
        join_cb = F.broadcast(cb) if n_cb <= broadcast_cap else cb
        # L0 collisions: exact, against the recent per-batch band dirs
        cand_frames = []
        l0 = _read_batch_bands(spark, store_dir, exclude_batch)
        if l0 is not None:
            cand_frames.append(l0.join(join_cb, ["band_id", "band_hash"]))
        # base collisions: gate-filter the batch bands (a band hash the
        # base gate never saw cannot collide with the base — the gate
        # covers exactly the compacted base, rebuilt at compaction, so
        # staleness only over-covers), then prune the base to the
        # surviving bands' buckets
        state = _read_compact_pointer(store_dir)
        if state is not None:
            gb = cb
            gate_dir = p.get("gate_dir")
            if gate_dir is not None:
                from waterdata_spark.operators.sketches import (
                    count_min_might_contain,
                )
                from waterdata_spark.streaming.gates import read_gate

                # one pointer read -> (table, params) pair (r12: the
                # compaction may have auto-RESIZED the gate; mixing a
                # resized width with an old table would false-negative)
                _, gate_df, gp = read_gate(spark, gate_dir)
                if gp.get("est_fp", 0.0) >= 0.9:
                    # saturated gate flags everything — probing it is
                    # pure overhead; fall through with gb = cb (every
                    # batch band consults the bucket-pruned base)
                    pass
                else:
                    gb = count_min_might_contain(
                        gate_df,
                        cb,
                        "band_hash",
                        gp["depth"],
                        gp["width"],
                        seed=gp["seed"],
                        out_col="__maybe",
                    ).filter(F.col("__maybe")).drop("__maybe").persist()
            n_gb = gb.count()
            buckets = None
            if n_gb and state[1] is not None:
                buckets = [
                    r["b"]
                    for r in gb.select(
                        digest_bucket("band_hash", state[1]).alias("b")
                    ).distinct().collect()
                ]
            base = _read_base_bands(spark, store_dir, buckets=buckets)
            if n_gb and base is not None:
                join_gb = F.broadcast(gb) if n_gb <= broadcast_cap else gb
                cand_frames.append(
                    base.join(join_gb, ["band_id", "band_hash"])
                )
        if not cand_frames:
            return batch_df.select(id_col).limit(0)
        cand = cand_frames[0]
        for f_ in cand_frames[1:]:
            cand = cand.unionByName(f_)
        # stage 2 FIRST, from the signatures the band rows CARRY (r12
        # probe finding: hot band buckets — boilerplate/templated docs
        # sharing a band hash by the hundreds — produced 1.3M collision
        # pairs at 500k stored docs, and fetching text for all of them
        # before estimating was the probe's 117s/batch term; the batch
        # operator estimates from signatures before any text access,
        # and now so does this): compare the stored doc's signature
        # array against the batch doc's signature, keep pairs whose
        # estimated Jaccard clears threshold - margin. No text, no
        # fetch — hot-bucket random collisions die here.
        c_named = csig.select(
            F.col(id_col),
            *[F.col(f"__h{i}").alias(f"__ch{i}") for i in range(n_hashes)],
        )
        matches = sum(
            (F.col(f"__ch{i}") == F.element_at("__sig", i + 1)).cast("int")
            for i in range(n_hashes)
        )
        threshold, margin = p["threshold"], p["prefilter_margin"]
        if not exact_verify:
            est_cut = threshold  # the estimate IS the decision
        elif margin is None:
            # dedup_against parity (r12 review catch): margin None
            # DISABLES stage 2 — every band-colliding pair goes to
            # exact verification. Filtering at the raw threshold here
            # would drop true near-dups whose estimate dips below it
            # by estimator noise (sigma ~ sqrt(j(1-j)/n_hashes)).
            est_cut = None
        else:
            est_cut = max(0.0, threshold - margin)
        # filter BEFORE deduplicating pairs: a hot band bucket emits
        # up to n_bands copies of a pair, and deduplicating first would
        # shuffle every collision row WITH its signature payload; the
        # estimate is a map-side 16-comparison predicate, so evaluate
        # it on the raw collision stream and distinct only the tiny
        # survivor set
        joined = cand.select(id_col, "__rid", "__sig").join(c_named, id_col)
        if est_cut is not None:
            joined = joined.filter(
                matches.cast("double") / F.lit(float(n_hashes))
                >= F.lit(float(est_cut))
            )
        pairs = joined.select(id_col, "__rid").distinct().persist()
        n_pairs = pairs.count()  # estimate-surviving pairs only
        if not exact_verify:
            # signature-only decision at the FULL threshold (the
            # flag_near_reference trade: trust the sketch, never read
            # the release on the hot path — release_dir may be None)
            flagged = pairs.select(id_col).distinct()
            return flagged.localCheckpoint(eager=True)
        if n_pairs == 0:
            return batch_df.select(id_col).limit(0)
        # stage 3 fetch: text for the estimate-SURVIVING reference ids
        # only (candidate-bounded, shard-pruned release point read).
        # Legacy-manifest defaults mirror append_training_shards'
        # (r12 review: a pre-field manifest must not KeyError here).
        man = json.load(open(os.path.join(release_dir, MANIFEST)))
        m_id = man.get("id_col", "doc_id")
        m_text = man.get("text_col", "text")
        r_ids = pairs.select(F.col("__rid").alias(m_id)).distinct()
        shards = [
            r["__shard"]
            for r in with_shard(
                r_ids, m_id, int(man["n_shards"]), man["salt"]
            ).select("__shard").distinct().collect()
        ]  # bounded: <= n_shards
        # n_pairs bounds the distinct reference ids — honor the same
        # broadcast_cap every other frame in the cascade honors (r12
        # review: a mostly-duplicate batch replay can make this set
        # batch-sized)
        join_rids = F.broadcast(r_ids) if n_pairs <= broadcast_cap else r_ids
        ref = read_training_shards(
            spark, release_dir, schema=release_schema, shards=shards
        ).join(join_rids, m_id, "left_semi")
        ref = ref.select(
            F.col(m_id).alias("__rid"),
            F.col(m_text).alias("__rtext"),
        ).persist()
        # stage 3: exact shingle Jaccard on the plausible pairs
        csh = batch_df.join(
            pairs.select(id_col).distinct(), id_col, "left_semi"
        ).select(
            F.col(id_col),
            _hashed_shingle_array(F.col(text_col), p["k"]).alias("__sa"),
        )
        rsh = ref.join(
            pairs.select("__rid").distinct(), "__rid", "left_semi"
        ).select(
            "__rid", _hashed_shingle_array(F.col("__rtext"), p["k"]).alias("__sb")
        )
        j = pairs.join(csh, id_col).join(rsh, "__rid")
        inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
        union = (F.size("__sa") + F.size("__sb")).cast("double") - inter
        flagged = (
            j.filter(inter / F.greatest(union, F.lit(1.0)) >= threshold)
            .select(id_col)
            .distinct()
        )
        # materialize before releasing the persisted intermediates
        return flagged.localCheckpoint(eager=True)
    finally:
        for frame in ((csig if own_sig else None), cb, gb, pairs, ref):
            if frame is not None:
                try:
                    frame.unpersist()
                except Exception:
                    pass


def neardup_store_batch(
    survivors: DataFrame,
    batch_id: int,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    precomputed_sig: DataFrame | None = None,
) -> None:
    """Append the batch SURVIVORS' band rows (whole-directory
    overwrite of ``batch=N`` — idempotent on replay). ``survivors``
    must be deterministic across evaluations (persisted upstream —
    the split-plan contract)."""
    p = _read_params(store_dir)
    base_sig = (
        _batch_signatures(survivors, p, id_col, text_col)
        if precomputed_sig is None
        else precomputed_sig.join(
            survivors.select(id_col), id_col, "left_semi"
        )
    )
    sig = base_sig.withColumn(
        "__sig", F.array(*[F.col(f"__h{i}") for i in range(p["n_hashes"])])
    ).persist()  # feeds both the band pass and the __sig join — one
    # signature computation, deterministic across the two branches
    try:
        bands = _bands_from_signature(
            sig, id_col, p["n_hashes"], p["n_bands"], p["hash_fn"]
        ).join(sig.select(id_col, "__sig"), id_col).select(
            F.col(id_col).alias("__rid"), "band_id", "band_hash", "__sig"
        )
        bands.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={batch_id}")
        )
    finally:
        sig.unpersist()
    # NOTE (r12): the band gate is NOT updated here — it covers the
    # compacted base only and is rebuilt by compact_bands (the
    # hot-path sketch merge+rewrite was the largest profiled per-batch
    # term of the digest path; the same economics apply). This batch's
    # band rows are L0 until the next compaction and collide exactly.
