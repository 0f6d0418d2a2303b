"""End-to-end incremental ingest (streaming/ingest.py): stream of
micro-batches == one-shot ingest, cross-batch and within-batch dedup,
replay idempotence at every sub-store, and the staged exactly-once
release append (r11)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from waterdata_spark.sources.shards import (
    MANIFEST,
    append_training_shards,
    read_training_shards,
    write_training_shards,
)
from waterdata_spark.streaming.ingest import (
    ingest_batch,
    ingest_stream_sink,
    init_ingest,
    read_digests,
)


def _docs(spark, lo, hi, dup_of=()):
    rows = [(i, f"document body number {i} with words") for i in range(lo, hi)]
    rows += [(10_000 + j, f"document body number {d} with words") for j, d in enumerate(dup_of)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dirs(tmp_path, name):
    base = tmp_path / name
    return str(base / "release"), str(base / "digests"), str(base / "gate")


class TestIngestBatch:
    def test_cross_batch_and_within_batch_dedup(self, spark, tmp_path):
        rel, dig, gate = _dirs(tmp_path, "a")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        # batch 0: 30 docs, one within-batch dup (id 10_000 dups doc 3)
        n0 = ingest_batch(_docs(spark, 0, 30, dup_of=[3]), 0, rel, dig, gate)
        assert n0 == 30
        # batch 1: 10 new docs + 5 cross-batch dups of batch 0 content
        n1 = ingest_batch(
            _docs(spark, 30, 40, dup_of=[1, 2, 3, 4, 5]), 1, rel, dig, gate
        )
        assert n1 == 10
        back = read_training_shards(
            spark, rel, schema="doc_id long, text string"
        )
        texts = [r["text"] for r in back.collect()]
        assert len(texts) == 40 and len(set(texts)) == 40  # no dup content
        man = json.load(open(os.path.join(rel, MANIFEST)))
        assert man["total_rows"] == 40 and man["last_append_batch"] == 1
        assert read_digests(spark, dig).count() == 40

    def test_replay_is_noop_everywhere(self, spark, tmp_path):
        rel, dig, gate = _dirs(tmp_path, "b")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        b0 = _docs(spark, 0, 25)
        assert ingest_batch(b0, 0, rel, dig, gate) == 25
        man_before = json.load(open(os.path.join(rel, MANIFEST)))
        dig_before = sorted(
            r[0] for r in read_digests(spark, dig).collect()
        )
        # checkpoint-recovery redelivery of the SAME batch id
        assert ingest_batch(b0, 0, rel, dig, gate) == 25
        man_after = json.load(open(os.path.join(rel, MANIFEST)))
        assert man_after == man_before  # release untouched (pointer)
        assert sorted(r[0] for r in read_digests(spark, dig).collect()) == dig_before
        back = read_training_shards(spark, rel, schema="doc_id long, text string")
        assert back.count() == 25  # no duplicate rows in the data files

    def test_ingest_twice_equals_ingest_once(self, spark, tmp_path):
        # the headline law: re-ingesting the same crawl (as NEW batch
        # ids) adds nothing
        rel, dig, gate = _dirs(tmp_path, "c")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        b = _docs(spark, 0, 20)
        assert ingest_batch(b, 0, rel, dig, gate) == 20
        assert ingest_batch(b, 1, rel, dig, gate) == 0
        man = json.load(open(os.path.join(rel, MANIFEST)))
        assert man["total_rows"] == 20


class TestCompaction:
    def test_compact_preserves_membership_and_folds_dirs(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import compact_digests

        rel, dig, gate = _dirs(tmp_path, "k")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        for b in range(3):
            ingest_batch(_docs(spark, 20 * b, 20 * (b + 1)), b, rel, dig, gate)
        before = sorted(r[0] for r in read_digests(spark, dig).collect())
        base = compact_digests(spark, dig)
        assert base == "base_v0"
        assert not [d for d in os.listdir(dig) if d.startswith("batch=")]
        after = sorted(r[0] for r in read_digests(spark, dig).collect())
        assert after == before
        # cross-corpus dedup still works against the compacted base
        n = ingest_batch(
            _docs(spark, 60, 70, dup_of=[1, 25, 45]), 3, rel, dig, gate
        )
        assert n == 10
        # second PLAIN compaction folds the new batch dir as a delta
        # layer (r12 leveled default — O(new), not O(corpus))
        assert compact_digests(spark, dig) == "delta_v1"
        assert read_digests(spark, dig).count() == 70
        # an explicit full fold collapses the layers
        assert compact_digests(spark, dig, mode="full") == "base_v2"
        assert read_digests(spark, dig).count() == 70
        empty = tmp_path / "empty-nothing"
        empty.mkdir()
        with pytest.raises(RuntimeError):
            compact_digests(spark, str(empty))


class TestBucketedDigestStore:
    def test_pruned_probe_equals_full_scan(self, spark, tmp_path):
        """r12 (VERDICT r11 item 1): after compaction the base is
        bucketed on the digest; ingest against the bucketed store must
        produce the same corpus as the unbucketed semantics, the
        pointer must carry the bucket count, and a pruned read
        restricted to a digest set's buckets must contain exactly the
        stored members of that set."""
        from waterdata_spark.streaming.ingest import (
            _read_compact_pointer,
            compact_digests,
            digest_bucket,
        )

        rel, dig, gate = _dirs(tmp_path, "bk")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        for b in range(2):
            ingest_batch(_docs(spark, 30 * b, 30 * (b + 1)), b, rel, dig, gate)
        compact_digests(spark, dig, n_buckets=8)
        assert _read_compact_pointer(dig) == ("base_v0", 8)
        # bucket directories exist on disk (partition layout)
        base = str(tmp_path / "bk" / "digests" / "base_v0")
        assert [d for d in os.listdir(base) if d.startswith("__bkt=")]
        # ingest new + dups against the bucketed base: same semantics
        n = ingest_batch(
            _docs(spark, 60, 70, dup_of=[5, 35, 59]), 2, rel, dig, gate
        )
        assert n == 10
        assert read_digests(spark, dig).count() == 70
        # pruned read: probing a known digest set's buckets finds every
        # stored member of the set and nothing outside those buckets
        probe = _docs(spark, 10, 12)  # stored content (batch 0)
        from waterdata_spark.operators.dedup import content_digest

        pdig = probe.select(content_digest(["text"]).alias("__ingest_digest"))
        bkts = [
            r["b"]
            for r in pdig.select(
                digest_bucket("__ingest_digest", 8).alias("b")
            ).distinct().collect()
        ]
        pruned = read_digests(spark, dig, buckets=bkts)
        hits = pruned.join(pdig, "__ingest_digest", "left_semi")
        assert hits.count() == 2
        # empty bucket list skips the base entirely (batch dirs only)
        assert read_digests(spark, dig, buckets=[]).count() == 10

    def test_rebucketing_and_target_sizing(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import (
            _read_compact_pointer,
            compact_digests,
        )

        rel, dig, gate = _dirs(tmp_path, "rb")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        ingest_batch(_docs(spark, 0, 40), 0, rel, dig, gate)
        compact_digests(spark, dig, target_rows_per_bucket=8)
        name, nb = _read_compact_pointer(dig)
        assert name == "base_v0" and nb == 8  # next pow2 of 40/8
        before = sorted(r[0] for r in read_digests(spark, dig).collect())
        # re-bucket at a different count: membership identical
        ingest_batch(_docs(spark, 40, 50), 1, rel, dig, gate)
        compact_digests(spark, dig, n_buckets=2)
        assert _read_compact_pointer(dig) == ("base_v1", 2)
        after = sorted(r[0] for r in read_digests(spark, dig).collect())
        assert len(after) == 50 and set(before) <= set(after)

    def test_broadcast_and_fallback_plans_agree(self, spark, tmp_path):
        """broadcast_cap=0 forces the distributed anti-join fallback;
        the survivor set must equal the broadcast semi-probe plan's."""
        from waterdata_spark.streaming.ingest import compact_digests

        results = {}
        for cap, tag in ((1_000_000, "bc"), (0, "fb")):
            rel, dig, gate = _dirs(tmp_path, f"plan-{tag}")
            init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
            ingest_batch(_docs(spark, 0, 30), 0, rel, dig, gate)
            compact_digests(spark, dig, n_buckets=4)
            n = ingest_batch(
                _docs(spark, 30, 40, dup_of=[3, 7, 29]), 1, rel, dig, gate,
                broadcast_cap=cap,
            )
            assert n == 10
            back = read_training_shards(
                spark, rel, schema="doc_id long, text string"
            )
            results[tag] = sorted(r["text"] for r in back.collect())
        assert results["bc"] == results["fb"]

    def test_bloom_gate_kind_agrees_with_cms(self, spark, tmp_path):
        """r12: gate_kind='bloom' serves the base gate as one Arrow
        bit-gather (corpus-independent closure) — same exact survivor
        semantics as the cms gate, rebuilt by the same compaction."""
        from waterdata_spark.streaming.gates import _read_params
        from waterdata_spark.streaming.ingest import compact_digests

        results = {}
        for kind in ("cms", "bloom"):
            rel, dig, gate = _dirs(tmp_path, f"gk-{kind}")
            init_ingest(
                spark, rel, dig, gate, n_shards=4,
                gate_kind=kind, cms_width=4096, bloom_bits=1 << 14,
            )
            assert _read_params(gate)["kind"] == kind
            ingest_batch(_docs(spark, 0, 30), 0, rel, dig, gate)
            compact_digests(spark, dig, n_buckets=4)  # rebuilds the gate
            n = ingest_batch(
                _docs(spark, 30, 40, dup_of=[2, 11, 29]), 1, rel, dig, gate
            )
            assert n == 10
            back = read_training_shards(
                spark, rel, schema="doc_id long, text string"
            )
            results[kind] = sorted(r["text"] for r in back.collect())
        assert results["cms"] == results["bloom"]
        with pytest.raises(ValueError, match="gate_kind"):
            init_ingest(
                spark, str(tmp_path / "bad-rel"), str(tmp_path / "bad-dig"),
                str(tmp_path / "bad-gate"), gate_kind="nope",
            )

    def test_replay_after_compaction_skips_digest_overwrite(self, spark, tmp_path):
        """ADVICE r11: crash between the digest/gate commit and the
        streaming checkpoint commit, maintenance compaction, restart —
        the replayed batch recomputes an empty survivor set; the guard
        must skip recreating an empty batch=N provenance directory."""
        from waterdata_spark.streaming.ingest import compact_digests

        rel, dig, gate = _dirs(tmp_path, "rc")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        b1 = _docs(spark, 20, 40)
        ingest_batch(_docs(spark, 0, 20), 0, rel, dig, gate)
        assert ingest_batch(b1, 1, rel, dig, gate) == 20
        compact_digests(spark, dig, n_buckets=4)
        # replay of batch 1 after its digests were folded into the base
        assert ingest_batch(b1, 1, rel, dig, gate) == 0
        assert not os.path.isdir(os.path.join(dig, "batch=1"))
        assert read_digests(spark, dig).count() == 40
        man = json.load(open(os.path.join(rel, MANIFEST)))
        assert man["total_rows"] == 40 and man["last_append_batch"] == 1


class TestPrepareHook:
    def test_curation_runs_per_batch(self, spark, tmp_path):
        """The prepare hook curates each batch before dedup: gated-out
        docs never reach the release, the digest store, or the gate."""
        from waterdata_spark.functions.text import GOPHER_THRESHOLDS
        from waterdata_spark.pipelines.curate import curate_corpus

        rel, dig, gate = _dirs(tmp_path, "p")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        # only the word-count band is restrictive; every other default
        # band is opened wide so the test pins the hook's plumbing, not
        # Gopher's thresholds
        bands = {k: (-1e18, 1e18) for k in GOPHER_THRESHOLDS}
        bands["n_words"] = (20, 1e9)
        good = [
            (i, " ".join(f"token{i}x{j}" for j in range(25))) for i in range(10)
        ]
        bad = [(100 + i, "too short") for i in range(5)]  # gated out
        batch = spark.createDataFrame(good + bad, "doc_id long, text string")
        n = ingest_batch(
            batch, 0, rel, dig, gate,
            prepare=lambda b: curate_corpus(
                b, quality_gate={"thresholds": bands}, audit=False
            ).df,
        )
        assert n == 10
        back = read_training_shards(spark, rel, schema="doc_id long, text string")
        ids = {r["doc_id"] for r in back.collect()}
        assert ids == set(range(10))  # gated docs never reached any store
        assert read_digests(spark, dig).count() == 10


class TestIngestStream:
    def test_stream_equals_batch_union(self, spark, tmp_path):
        rel, dig, gate = _dirs(tmp_path, "s")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        docs = _docs(spark, 0, 60, dup_of=[1, 2, 3])
        src = str(tmp_path / "src")
        docs.repartition(5).write.parquet(src)  # 5 files -> 5 batches
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ingest_stream_sink(stream, rel, dig, gate, str(tmp_path / "ckpt"))
        q.awaitTermination(180)
        back = read_training_shards(spark, rel, schema="doc_id long, text string")
        texts = [r["text"] for r in back.collect()]
        assert len(texts) == 60 and len(set(texts)) == 60
        man = json.load(open(os.path.join(rel, MANIFEST)))
        assert man["total_rows"] == 60
        assert read_digests(spark, dig).count() == 60


class TestStagedAppend:
    def test_batch_guard_and_staging_cleanup(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
        )
        out = str(tmp_path / "rel")
        write_training_shards(df, out, n_shards=4)
        batch = spark.createDataFrame(
            [(100 + i, f"new {i}") for i in range(10)], "doc_id long, text string"
        )
        m1 = append_training_shards(batch, out, batch_id=0)
        assert m1["last_append_batch"] == 0 and m1["total_rows"] == 50
        assert not [d for d in os.listdir(out) if d.startswith("_staging")]
        # replay: manifest, data, and staging all untouched
        m2 = append_training_shards(batch, out, batch_id=0)
        assert m2 == m1
        back = read_training_shards(spark, out, schema="doc_id long, text string")
        assert back.count() == 50

    def test_bare_append_raises_on_stream_managed_release(self, spark, tmp_path):
        """VERDICT r11 item 7: once the manifest carries
        last_append_batch, an unguarded append must refuse (force=True
        overrides); the guarded path is unchanged."""
        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
        )
        out = str(tmp_path / "relg")
        write_training_shards(df, out, n_shards=2)
        batch = spark.createDataFrame(
            [(100, "new a"), (101, "new b")], "doc_id long, text string"
        )
        # plain release: bare append is fine
        append_training_shards(batch, out)
        # stream-managed now: bare append refuses
        append_training_shards(
            spark.createDataFrame([(200, "c")], "doc_id long, text string"),
            out,
            batch_id=0,
        )
        with pytest.raises(ValueError, match="stream-managed"):
            append_training_shards(batch, out)
        man = append_training_shards(batch, out, force=True)
        assert man["total_rows"] == 15
        # guarded path still works after a forced append
        m2 = append_training_shards(
            spark.createDataFrame([(201, "d")], "doc_id long, text string"),
            out,
            batch_id=1,
        )
        assert m2["total_rows"] == 16 and m2["last_append_batch"] == 1

    def test_resume_after_partial_move(self, spark, tmp_path):
        """Simulated crash mid-move: stage manually, move one file,
        then run the append — it must resume the remaining moves and
        produce the same release as an uninterrupted append."""
        import glob
        import shutil

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
        )
        out = str(tmp_path / "rel2")
        write_training_shards(df, out, n_shards=4)
        batch = spark.createDataFrame(
            [(100 + i, f"new {i}") for i in range(12)], "doc_id long, text string"
        )
        # stage batch 0 by hand (what the real append does first)
        from waterdata_spark.sources.shards import with_shard

        staging = os.path.join(out, "_staging_batch_0")
        (
            with_shard(batch, "doc_id", 4)
            .repartition(4, "__shard")
            .write.partitionBy("__shard")
            .mode("overwrite")
            .format("json")
            .option("ignoreNullFields", True)
            .save(staging)
        )
        # "crash" after one file moved
        src = sorted(glob.glob(os.path.join(staging, "__shard=*", "part-*")))[0]
        rel_part = os.path.relpath(src, staging)
        os.makedirs(os.path.join(out, os.path.dirname(rel_part)), exist_ok=True)
        os.replace(src, os.path.join(out, rel_part))
        # replayed append resumes: no restage (SUCCESS present), moves
        # the rest, updates the manifest once
        man = append_training_shards(batch, out, batch_id=0)
        assert man["total_rows"] == 52
        back = read_training_shards(spark, out, schema="doc_id long, text string")
        assert back.count() == 52
        assert {r["doc_id"] for r in back.collect()} == set(range(40)) | {
            100 + i for i in range(12)
        }
        assert not os.path.isdir(staging)
        shutil.rmtree(out, ignore_errors=True)


class TestGateAutoSizeIngest:
    """r12: a saturated gate is bypassed (not probed) with semantics
    unchanged, and the default compaction re-sizes the gate to the
    base so it becomes useful again."""

    def test_saturated_gate_bypass_and_autosize(self, spark, tmp_path):
        from waterdata_spark.streaming.gates import read_gate
        from waterdata_spark.streaming.ingest import compact_digests

        rel, dig, gate = _dirs(tmp_path, "as")
        # pathologically tiny gate: saturates on the first compaction
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=8)
        for b in range(2):
            assert (
                ingest_batch(_docs(spark, 30 * b, 30 * (b + 1)), b, rel, dig, gate)
                == 30
            )
        compact_digests(spark, dig, n_buckets=4, gate_auto_size=False)
        _, _, p = read_gate(spark, gate)
        assert p["width"] == 8 and p["est_fp"] >= 0.9
        # the bypass carries the batch: dups still dropped, new lands
        assert (
            ingest_batch(_docs(spark, 60, 70, dup_of=[5, 35]), 2, rel, dig, gate)
            == 10
        )
        assert read_digests(spark, dig).count() == 70
        # default compaction auto-sizes the gate to the base
        compact_digests(spark, dig, n_buckets=4)
        _, _, p2 = read_gate(spark, gate)
        assert p2["width"] > 8 and p2["n_keys"] == 70 and p2["est_fp"] < 0.9
        # and the healthy gate agrees with the bypassed semantics
        assert (
            ingest_batch(_docs(spark, 70, 75, dup_of=[61]), 3, rel, dig, gate)
            == 5
        )
        assert read_digests(spark, dig).count() == 75


class TestLeveledCompaction:
    """r12: delta compaction folds only the new batch dirs into a
    bucketed layer (gate grown by the additive merge) — O(new) instead
    of the full fold's O(corpus) — with membership and ingest
    semantics identical, and auto mode escalating to a full fold."""

    def test_delta_layers_preserve_membership(self, spark, tmp_path):
        from waterdata_spark.streaming.gates import read_gate
        from waterdata_spark.streaming.ingest import (
            _read_compact_pointer,
            compact_digests,
        )

        rel, dig, gate = _dirs(tmp_path, "lv")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        ingest_batch(_docs(spark, 0, 30), 0, rel, dig, gate)
        compact_digests(spark, dig, n_buckets=8)  # full fold (args)
        assert _read_compact_pointer(dig) == ("base_v0", 8)
        # two more batches, then a PLAIN compaction: auto picks delta
        for b in (1, 2):
            ingest_batch(_docs(spark, 30 * b, 30 * (b + 1)), b, rel, dig, gate)
        compact_digests(spark, dig)
        assert _read_compact_pointer(dig) == ("base_v0+delta_v1", 8)
        # delta layer is FLAT (cadence-bounded, read whole — bucketing
        # it would cost O(bucket count) files for O(cadence) rows)
        assert not [
            d
            for d in os.listdir(os.path.join(dig, "delta_v1"))
            if d.startswith("__bkt=")
        ]
        # batch dirs folded away; membership complete across layers
        assert not [d for d in os.listdir(dig) if d.startswith("batch=")]
        assert read_digests(spark, dig).count() == 90
        # the gate grew by the delta: every stored digest still flags
        _, _, p = read_gate(spark, gate)
        assert p["est_fp"] < 0.9
        from waterdata_spark.operators.sketches import count_min_might_contain
        from waterdata_spark.streaming.gates import read_cms

        flagged = count_min_might_contain(
            read_cms(spark, gate),
            read_digests(spark, dig),
            "__ingest_digest",
            p["depth"],
            p["width"],
            seed=p["seed"],
            out_col="m",
        )
        assert flagged.filter(~F.col("m")).count() == 0
        # ingest against the layered store: dups of BOTH layers drop
        n = ingest_batch(
            _docs(spark, 90, 100, dup_of=[5, 65]), 3, rel, dig, gate
        )
        assert n == 10
        assert read_digests(spark, dig).count() == 100

    def test_auto_escalates_to_full_fold(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import (
            _read_compact_pointer,
            compact_digests,
        )

        rel, dig, gate = _dirs(tmp_path, "lv2")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        ingest_batch(_docs(spark, 0, 10), 0, rel, dig, gate)
        compact_digests(spark, dig, n_buckets=4)
        for b in range(1, 4):
            ingest_batch(_docs(spark, 10 * b, 10 * (b + 1)), b, rel, dig, gate)
            compact_digests(spark, dig, max_layers=3)
        # layers: base_v0 + delta_v1 + delta_v2, then the 3rd plain
        # compaction hits max_layers and folds everything
        assert _read_compact_pointer(dig) == ("base_v3", 4)
        assert not [d for d in os.listdir(dig) if d.startswith("delta_")]
        assert read_digests(spark, dig).count() == 40
        # explicit re-bucketing always escalates
        ingest_batch(_docs(spark, 40, 50), 4, rel, dig, gate)
        compact_digests(spark, dig, n_buckets=8)
        assert _read_compact_pointer(dig) == ("base_v4", 8)
        assert read_digests(spark, dig).count() == 50

    def test_delta_requires_base(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import compact_digests

        rel, dig, gate = _dirs(tmp_path, "lv3")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        ingest_batch(_docs(spark, 0, 10), 0, rel, dig, gate)
        with pytest.raises(RuntimeError, match="full fold first"):
            compact_digests(spark, dig, mode="delta")


class TestReviewFixesR12:
    """Regression pins for the r12 self-review findings."""

    def test_auto_compaction_with_no_batches_refolds(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import (
            _read_compact_pointer,
            compact_digests,
        )

        rel, dig, gate = _dirs(tmp_path, "nb")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        ingest_batch(_docs(spark, 0, 20), 0, rel, dig, gate)
        compact_digests(spark, dig, n_buckets=4)
        # idle-period maintenance call with ZERO new batches: pre-r12
        # semantics (a successful no-op re-fold), not a RuntimeError
        assert compact_digests(spark, dig) == "base_v1"
        assert _read_compact_pointer(dig) == ("base_v1", 4)
        assert read_digests(spark, dig).count() == 20

    def test_legacy_store_without_params_must_name_gate(self, spark, tmp_path):
        from waterdata_spark.streaming.ingest import compact_digests
        from waterdata_spark.streaming.gates import init_cms_store

        rel, dig, gate = _dirs(tmp_path, "lg")
        init_ingest(spark, rel, dig, gate, n_shards=4, cms_width=4096)
        ingest_batch(_docs(spark, 0, 10), 0, rel, dig, gate)
        os.remove(os.path.join(dig, "_PARAMS.json"))  # simulate pre-r12
        # silent gate skip would under-cover the base (duplication):
        # the caller must name the gate or explicitly opt out
        with pytest.raises(RuntimeError, match="gate"):
            compact_digests(spark, dig)
        assert compact_digests(spark, dig, gate_dir=gate) == "base_v0"
        # explicit opt-out for a store that truly has no gate
        ingest_batch(_docs(spark, 10, 20), 1, rel, dig, gate)
        assert compact_digests(spark, dig, gate_dir=False, mode="full") == "base_v1"

    def test_bloom_autosize_clamps_at_ceiling(self, spark, tmp_path, monkeypatch):
        import waterdata_spark.operators.bloom as bloom_mod
        from waterdata_spark.streaming.gates import (
            bloom_rebuild,
            init_bloom_store,
            read_bloom,
        )

        monkeypatch.setattr(bloom_mod, "_MAX_BITS", 2048)
        ref = spark.range(0, 2000).select(
            F.sha2(F.col("id").cast("string"), 256).alias("h")
        )
        table = str(tmp_path / "bcl")
        # non-power-of-two-divisor start: doubling from 768 overshoots
        # 2048 (1536 -> 3072) unless clamped
        init_bloom_store(ref.limit(0), table, "h", n_bits=768, k=4)
        bloom_rebuild(ref, table, auto_size=True)
        assert read_bloom(table).n_bits == 2048  # clamped, not raised
