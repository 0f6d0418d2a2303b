"""Stream-maintained near-dup membership (streaming/neardup.py, r12 —
VERDICT r11 item 2): stream-of-batches == iterated batch
``dedup_against`` on the accumulated corpus, replay no-op, planted
cross-batch near-dups dropped, band-store compaction/pruning
equivalence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup import content_digest, exact_dedup
from waterdata_spark.operators.dedup_approx import dedup_against
from waterdata_spark.sources.shards import read_training_shards
from waterdata_spark.streaming.ingest import ingest_batch, init_ingest
from waterdata_spark.streaming.neardup import (
    compact_bands,
    flag_near_stored,
    init_neardup,
    neardup_store_batch,
    read_bands,
)

SCHEMA = "doc_id long, text string"


def _sentence(i: int) -> str:
    words = [f"alpha{i}word{j}beta" for j in range(12)]
    return "document number %d about %s and more filler content" % (
        i,
        " ".join(words),
    )


def _near(i: int) -> str:
    # same long body, one word appended — char-8-shingle Jaccard >> 0.7
    return _sentence(i) + " extra"


def _batches(spark):
    """Three batches: b0 seeds 0-19; b1 has 10 new + near-dups of 2
    stored docs; b2 has 8 new + near-dups of one b0 doc and one b1 doc
    + an exact dup of a b1 doc."""
    b0 = spark.createDataFrame(
        [(i, _sentence(i)) for i in range(20)], SCHEMA
    )
    b1 = spark.createDataFrame(
        [(100 + i, _sentence(30 + i)) for i in range(10)]
        + [(200, _near(3)), (201, _near(7))],
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        [(300 + i, _sentence(50 + i)) for i in range(8)]
        + [(400, _near(15)), (401, _near(32)), (402, _sentence(33))],
        SCHEMA,
    )
    return [b0, b1, b2]


def _dirs(tmp_path, name):
    base = tmp_path / name
    return (
        str(base / "release"),
        str(base / "digests"),
        str(base / "gate"),
        str(base / "bands"),
        str(base / "bgate"),
    )


def _ingest_all(spark, tmp_path, name, gate=True, compact_after=None):
    rel, dig, gt, nd, bg = _dirs(tmp_path, name)
    init_ingest(spark, rel, dig, gt, n_shards=4, cms_width=4096)
    init_neardup(
        spark, nd, gate_dir=bg if gate else None, cms_width=4096
    )
    landed = []
    for i, b in enumerate(_batches(spark)):
        landed.append(
            ingest_batch(
                b, i, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA
            )
        )
        if compact_after is not None and i == compact_after:
            compact_bands(spark, nd, n_buckets=8)
    back = read_training_shards(spark, rel, schema=SCHEMA)
    return rel, dig, gt, nd, landed, back


class TestStreamEqualsBatch:
    def test_planted_near_dups_dropped_and_batch_equivalence(self, spark, tmp_path):
        rel, dig, gt, nd, landed, back = _ingest_all(spark, tmp_path, "a")
        got = {r["doc_id"] for r in back.collect()}
        # near-dups 200/201 (of stored 3/7), 400 (of stored 15),
        # 401 (of batch-1 survivor 32's doc 102... id 100+2) dropped;
        # exact dup 402 (of stored 33 == id 103's content? no — 33 is
        # new content ingested as id 103) — 402 duplicates doc 103's
        # text EXACTLY, so the exact stage drops it
        assert 200 not in got and 201 not in got
        assert 400 not in got and 401 not in got and 402 not in got
        assert landed == [20, 10, 8]
        # row-for-row batch-operator equivalence: iterate exact_dedup →
        # dedup_against_exact → dedup_against with the module defaults
        from waterdata_spark.operators.dedup import dedup_against_exact

        acc = None
        for b in _batches(spark):
            keyed = exact_dedup(
                b.withColumn("__d", content_digest(["text"])), [], "doc_id",
                digest_col="__d",
            )
            if acc is None:
                new = keyed
            else:
                ref_d = acc.withColumn("__d", content_digest(["text"]))
                exact_new = dedup_against_exact(
                    keyed, ref_d, [], digest_col="__d"
                )
                new = dedup_against(
                    exact_new.drop("__d"), acc,
                    id_col="doc_id", text_col="text",
                    n_hashes=16, n_bands=4, k=8,
                    threshold=0.7, prefilter_margin=0.25, hash_fn="xx",
                ).withColumn("__d", content_digest(["text"]))
            acc = (
                new.drop("__d") if acc is None else
                acc.unionByName(new.drop("__d"))
            ).localCheckpoint(eager=True)
        want = {(r["doc_id"], r["text"]) for r in acc.collect()}
        have = {(r["doc_id"], r["text"]) for r in back.collect()}
        assert have == want

    def test_gate_and_gateless_agree(self, spark, tmp_path):
        *_, landed_g, back_g = _ingest_all(spark, tmp_path, "g", gate=True)
        *_, landed_n, back_n = _ingest_all(spark, tmp_path, "n", gate=False)
        assert landed_g == landed_n
        assert sorted(r["doc_id"] for r in back_g.collect()) == sorted(
            r["doc_id"] for r in back_n.collect()
        )

    def test_compaction_mid_stream_changes_nothing(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import _read_compact_pointer

        rel, dig, gt, nd, landed, back = _ingest_all(
            spark, tmp_path, "c", compact_after=1
        )
        assert landed == [20, 10, 8]
        assert _read_compact_pointer(nd) == ("base_v0", 8)
        base = os.path.join(nd, "base_v0")
        assert [d for d in os.listdir(base) if d.startswith("__bkt=")]
        # post-compaction batch dir exists for batch 2 (L0)
        assert os.path.isdir(os.path.join(nd, "batch=2"))
        # store holds 4 band rows per landed document
        assert read_bands(spark, nd).count() == 4 * sum(landed)


class TestReplayAndStore:
    def test_replay_is_noop(self, spark, tmp_path):
        rel, dig, gt, nd, bg = _dirs(tmp_path, "r")
        init_ingest(spark, rel, dig, gt, n_shards=4, cms_width=4096)
        init_neardup(spark, nd, gate_dir=bg, cms_width=4096)
        [b0, b1, _] = _batches(spark)
        assert ingest_batch(b0, 0, rel, dig, gt, neardup_dir=nd,
                            release_schema=SCHEMA) == 20
        assert ingest_batch(b1, 1, rel, dig, gt, neardup_dir=nd,
                            release_schema=SCHEMA) == 10
        bands_before = sorted(
            map(tuple, read_bands(spark, nd).collect())
        )
        # checkpoint-recovery redelivery of batch 1
        assert ingest_batch(b1, 1, rel, dig, gt, neardup_dir=nd,
                            release_schema=SCHEMA) == 10
        assert sorted(map(tuple, read_bands(spark, nd).collect())) == bands_before
        back = read_training_shards(spark, rel, schema=SCHEMA)
        assert back.count() == 30

    def test_flag_near_stored_direct(self, spark, tmp_path):
        """The flagging operator standalone: planted near-dup flagged,
        fresh doc not; empty store flags nothing."""
        rel, dig, gt, nd, bg = _dirs(tmp_path, "d")
        init_ingest(spark, rel, dig, gt, n_shards=4, cms_width=4096)
        init_neardup(spark, nd, gate_dir=bg, cms_width=4096)
        [b0, _, _] = _batches(spark)
        probe = spark.createDataFrame(
            [(900, _near(5)), (901, _sentence(77))], SCHEMA
        )
        # empty store: nothing flagged
        assert flag_near_stored(probe, nd, rel, release_schema=SCHEMA).count() == 0
        ingest_batch(b0, 0, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        flagged = {
            r["doc_id"]
            for r in flag_near_stored(
                probe, nd, rel, release_schema=SCHEMA
            ).collect()
        }
        assert flagged == {900}
        # exact_verify=False: band-collision-only decision, release
        # never read (None) — flags a SUPERSET of the verified set
        # that must still include the planted near-dup
        est = {
            r["doc_id"]
            for r in flag_near_stored(
                probe, nd, None, exact_verify=False
            ).collect()
        }
        assert flagged <= est and 900 in est
        # store_batch is idempotent per batch dir
        neardup_store_batch(probe, 7, nd)
        neardup_store_batch(probe, 7, nd)
        assert read_bands(spark, nd).filter(
            F.col("__rid") >= 900
        ).count() == 8  # 2 docs x 4 bands, once


class TestBandGateAutoSize:
    """r12: saturated band-gate bypass keeps the cascade decision
    exact; the default compaction auto-sizes the gate back to useful."""

    def test_saturated_band_gate_bypass_and_autosize(self, spark, tmp_path):
        from waterdata_spark.streaming.gates import read_gate

        rel, dig, gt, nd, bg = _dirs(tmp_path, "sat")
        init_ingest(spark, rel, dig, gt, n_shards=4, cms_width=4096)
        init_neardup(spark, nd, gate_dir=bg, cms_width=4)  # tiny gate
        bs = _batches(spark)
        landed = [
            ingest_batch(bs[0], 0, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        ]
        compact_bands(spark, nd, n_buckets=8, gate_auto_size=False)
        _, _, p = read_gate(spark, bg)
        assert p["width"] == 4 and p["est_fp"] >= 0.9  # saturated
        # bypassed gate: decision identical to the healthy-gate run
        landed.append(
            ingest_batch(bs[1], 1, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        )
        assert landed == [20, 10]
        compact_bands(spark, nd, n_buckets=8)  # default auto-sizes
        _, _, p2 = read_gate(spark, bg)
        assert p2["width"] > 4 and p2["est_fp"] < 0.9
        landed.append(
            ingest_batch(bs[2], 2, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        )
        assert landed == [20, 10, 8]


class TestLeveledBandCompaction:
    """r12: delta compaction of the band store — near-dup decisions
    against a layered base equal the single-base semantics."""

    def test_delta_layers_keep_decisions(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import _read_compact_pointer

        rel, dig, gt, nd, bg = _dirs(tmp_path, "lvl")
        init_ingest(spark, rel, dig, gt, n_shards=4, cms_width=4096)
        init_neardup(spark, nd, gate_dir=bg, cms_width=4096)
        bs = _batches(spark)
        landed = [
            ingest_batch(bs[0], 0, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        ]
        compact_bands(spark, nd, n_buckets=8)  # full fold
        landed.append(
            ingest_batch(bs[1], 1, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        )
        compact_bands(spark, nd)  # plain: auto picks delta
        assert _read_compact_pointer(nd) == ("base_v0+delta_v1", 8)
        landed.append(
            ingest_batch(bs[2], 2, rel, dig, gt, neardup_dir=nd, release_schema=SCHEMA)
        )
        # identical decisions to the single-base runs elsewhere in this
        # file: 20 seeds, 10 new (2 near-dups dropped), 8 new (2 near +
        # 1 exact dropped)
        assert landed == [20, 10, 8]
        # band rows complete across layers + fresh batch dir
        assert read_bands(spark, nd).count() == 4 * sum(landed)


class TestReviewFixesR12:
    """Regression pins for the r12 self-review findings."""

    def test_margin_none_parity_with_dedup_against(self, spark, tmp_path):
        # prefilter_margin=None must DISABLE stage 2 (dedup_against's
        # contract) — not filter at the raw threshold, which drops true
        # near-dups whose 16-hash estimate dips below it by noise.
        # Pinned as a parity law on the full three-batch stream, with
        # broadcast_cap=0 so the non-broadcast r_ids path runs too.
        from waterdata_spark.operators.dedup import dedup_against_exact

        rel, dig, gt, nd, bg = _dirs(tmp_path, "mn")
        init_ingest(spark, rel, dig, gt, n_shards=4, cms_width=4096)
        init_neardup(spark, nd, gate_dir=None, prefilter_margin=None)
        landed = []
        for i, b in enumerate(_batches(spark)):
            kw = dict(neardup_dir=nd, release_schema=SCHEMA)
            landed.append(ingest_batch(b, i, rel, dig, gt, **kw))
        back = read_training_shards(spark, rel, schema=SCHEMA)
        # iterated batch operator with the SAME margin=None config
        acc = None
        for b in _batches(spark):
            keyed = exact_dedup(
                b.withColumn("__d", content_digest(["text"])), [], "doc_id",
                digest_col="__d",
            )
            if acc is None:
                new = keyed
            else:
                ref_d = acc.withColumn("__d", content_digest(["text"]))
                exact_new = dedup_against_exact(keyed, ref_d, [], digest_col="__d")
                new = dedup_against(
                    exact_new.drop("__d"), acc,
                    id_col="doc_id", text_col="text",
                    n_hashes=16, n_bands=4, k=8,
                    threshold=0.7, prefilter_margin=None, hash_fn="xx",
                ).withColumn("__d", content_digest(["text"]))
            acc = (
                new.drop("__d") if acc is None else acc.unionByName(new.drop("__d"))
            ).localCheckpoint(eager=True)
        want = {(r["doc_id"], r["text"]) for r in acc.collect()}
        have = {(r["doc_id"], r["text"]) for r in back.collect()}
        assert have == want

    def test_empty_store_rid_type_follows_params(self, spark, tmp_path):
        nd = str(tmp_path / "ridt")
        init_neardup(spark, nd, id_type="string")
        schema = read_bands(spark, nd).schema
        assert schema["__rid"].dataType.simpleString() == "string"
