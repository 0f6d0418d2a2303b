"""Streaming membership-gate maintenance (streaming/gates.py):
stream-of-batches == whole-corpus BIT-identity for both gate forms,
checkpoint-replay no-ops, and the maintained store serving
dedup_against_exact's prefilter with output pinned to the plain path
(VERDICT r10 item 4 — the TestStreamingProfile playbook applied to
the gates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.bloom import bloom_build
from waterdata_spark.operators.sketches import count_min_build
from waterdata_spark.streaming.gates import (
    bloom_batch,
    bloom_stream_sink,
    cms_batch,
    cms_stream_sink,
    init_bloom_store,
    init_cms_store,
    read_bloom,
    read_cms,
)

DEPTH, WIDTH = 4, 4096
N_BITS, K = 1 << 14, 4


def _ref(spark):
    # the "stored corpus" digest column a crawl gate summarizes
    return spark.range(0, 2000).select(
        F.sha2(F.concat(F.lit("doc:"), F.col("id").cast("string")), 256).alias("h")
    )


class TestCmsStore:
    def test_stream_equals_whole_corpus_bit_identical(self, spark, tmp_path):
        ref = _ref(spark)
        src = str(tmp_path / "src")
        ref.repartition(5).write.parquet(src)  # 5 files -> 5 micro-batches
        table = str(tmp_path / "cms")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=WIDTH)
        stream = (
            spark.readStream.schema(ref.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = cms_stream_sink(stream, table, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        got = {
            (r["d"], r["bucket"]): r["cnt"] for r in read_cms(spark, table).collect()
        }
        want = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in count_min_build(
                ref, "h", depth=DEPTH, width=WIDTH, seed="xgate"
            ).collect()
        }
        assert got == want  # counter sums are associative: BIT-identical

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        ref = _ref(spark)
        table = str(tmp_path / "cms2")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=WIDTH)
        assert cms_batch(ref, table, batch_id=0) == "v1"
        before = {
            (r["d"], r["bucket"]): r["cnt"] for r in read_cms(spark, table).collect()
        }
        assert cms_batch(ref, table, batch_id=0) is None  # replay: skip
        after = {
            (r["d"], r["bucket"]): r["cnt"] for r in read_cms(spark, table).collect()
        }
        assert before == after
        assert cms_batch(ref, table, batch_id=1) == "v2"  # next applies

    def test_rebuild_replaces_with_fresh_build(self, spark, tmp_path):
        """r12: cms_rebuild REPLACES the table (maintenance-time base
        gate) — bit-identical to a direct build over the same frame,
        version monotonic, batch pointer preserved."""
        from waterdata_spark.streaming.gates import cms_rebuild
        from waterdata_spark.streaming.profile import _read_pointer

        ref = _ref(spark)
        table = str(tmp_path / "cmsr")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=WIDTH)
        cms_batch(ref.limit(500), table, batch_id=0)
        v = cms_rebuild(ref, table)
        assert v == "v2" and _read_pointer(table) == ("v2", 0)
        got = sorted(map(tuple, read_cms(spark, table).collect()))
        want = sorted(
            map(
                tuple,
                count_min_build(
                    ref, "h", depth=DEPTH, width=WIDTH, seed="xgate"
                ).collect(),
            )
        )
        assert got == want  # replaced, not merged
        with pytest.raises(RuntimeError):
            cms_rebuild(ref, str(tmp_path / "absent"))

    def test_uninitialized_raises(self, spark, tmp_path):
        with pytest.raises(RuntimeError):
            read_cms(spark, str(tmp_path / "nope"))
        with pytest.raises(RuntimeError):
            cms_batch(_ref(spark), str(tmp_path / "nope"), 0)

    def test_superseded_versions_pruned(self, spark, tmp_path):
        # r11 review catch: per-micro-batch full copies must not
        # accumulate — at most current + one grace version stay on disk
        import os

        ref = _ref(spark)
        table = str(tmp_path / "cmsp")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=WIDTH)
        for b in range(2):
            cms_batch(ref.limit(100 * (b + 1)), table, batch_id=b)
        # ADVICE r11: the default 10-min age grace protects versions a
        # concurrent lazy reader may still reference — nothing this
        # young prunes under the default knobs
        def _vers():
            return sorted(
                d
                for d in os.listdir(table)
                if d.startswith("v") and not d.endswith(".params.json")
            )

        assert _vers() == ["v0", "v1", "v2"]
        for b in range(2, 4):
            cms_batch(
                ref.limit(100 * (b + 1)), table, batch_id=b,
                prune_min_age_sec=0.0,
            )
        assert _vers() == ["v3", "v4"]
        # r12: pruned versions take their params sidecars with them
        side = sorted(
            d for d in os.listdir(table) if d.endswith(".params.json")
        )
        assert side == ["v3.params.json", "v4.params.json"]
        assert read_cms(spark, table).count() > 0  # pointer still serves

    def test_store_serves_dedup_gate_exactly(self, spark, tmp_path):
        # the maintained store IS the gate: gated output must equal the
        # plain anti-join row-for-row (no false negatives at any state)
        from waterdata_spark.operators.dedup import dedup_against_exact

        ref = _ref(spark)
        table = str(tmp_path / "cms3")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=WIDTH)
        cms_batch(ref, table, batch_id=0)
        corpus = spark.range(1500, 2500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc:"), F.col("id").cast("string")).alias("text"),
        )
        reference = spark.range(0, 2000).select(
            F.concat(F.lit("doc:"), F.col("id").cast("string")).alias("text")
        )
        # gate on the sha2 digest of the content column — the same
        # encoding the store summarized
        keyed = corpus.withColumn("__d", F.sha2("text", 256))
        ref_keyed = reference.withColumn("__d", F.sha2("text", 256))
        gated = dedup_against_exact(
            keyed,
            ref_keyed,
            content_cols=[],
            digest_col="__d",
            prefilter="cms",
            prefilter_depth=DEPTH,
            prefilter_width=WIDTH,
            prefilter_cms=read_cms(spark, table),
        )
        plain = dedup_against_exact(keyed, ref_keyed, content_cols=[], digest_col="__d")
        got = sorted(r["doc_id"] for r in gated.collect())
        want = sorted(r["doc_id"] for r in plain.collect())
        assert got == want == list(range(2000, 2500))


class TestBloomStore:
    def test_stream_equals_whole_corpus_bit_identical(self, spark, tmp_path):
        ref = _ref(spark)
        src = str(tmp_path / "bsrc")
        ref.repartition(4).write.parquet(src)
        table = str(tmp_path / "bloom")
        init_bloom_store(ref.limit(0), table, "h", n_bits=N_BITS, k=K)
        stream = (
            spark.readStream.schema(ref.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = bloom_stream_sink(stream, table, str(tmp_path / "bckpt"))
        q.awaitTermination(120)
        got = read_bloom(table)
        want = bloom_build(ref, "h", n_bits=N_BITS, k=K, seed="xgate")
        assert got.to_bytes() == want.to_bytes()  # OR is associative
        assert (got.n_bits, got.k, got.seed) == (want.n_bits, want.k, want.seed)

    def test_replayed_batch_is_noop_and_versions_monotonic(self, spark, tmp_path):
        import os

        ref = _ref(spark)
        table = str(tmp_path / "bloom2")
        init_bloom_store(ref.limit(0), table, "h", n_bits=N_BITS, k=K)
        assert bloom_batch(ref, table, batch_id=0) == "v1.bits"
        before = read_bloom(table).to_bytes()
        assert bloom_batch(ref, table, batch_id=0) is None
        assert read_bloom(table).to_bytes() == before
        assert bloom_batch(ref, table, batch_id=1, prune_min_age_sec=0.0) == "v2.bits"
        assert bloom_batch(ref, table, batch_id=2, prune_min_age_sec=0.0) == "v3.bits"
        vers = [d for d in os.listdir(table) if d.endswith(".bits")]
        assert sorted(vers) == ["v2.bits", "v3.bits"]  # pruned (r11)

    def test_store_serves_dedup_gate_exactly(self, spark, tmp_path):
        from waterdata_spark.operators.dedup import dedup_against_exact

        ref = _ref(spark)
        table = str(tmp_path / "bloom3")
        init_bloom_store(ref.limit(0), table, "h", n_bits=N_BITS, k=K)
        bloom_batch(ref, table, batch_id=0)
        corpus = spark.range(1500, 2500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc:"), F.col("id").cast("string")).alias("text"),
        )
        reference = spark.range(0, 2000).select(
            F.concat(F.lit("doc:"), F.col("id").cast("string")).alias("text")
        )
        keyed = corpus.withColumn("__d", F.sha2("text", 256))
        ref_keyed = reference.withColumn("__d", F.sha2("text", 256))
        gated = dedup_against_exact(
            keyed,
            ref_keyed,
            content_cols=[],
            digest_col="__d",
            prefilter="bloom",
            prefilter_bloom=read_bloom(table),
        )
        plain = dedup_against_exact(keyed, ref_keyed, content_cols=[], digest_col="__d")
        assert sorted(r["doc_id"] for r in gated.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )


class TestGateAutoSize:
    """r12: rebuild-time auto-sizing + per-version params + the
    saturated-gate bypass signal (est_fp)."""

    def test_cms_rebuild_auto_size_grows_width(self, spark, tmp_path):
        from waterdata_spark.operators.sketches import count_min_might_contain
        from waterdata_spark.streaming.gates import (
            _params_for,
            cms_rebuild,
            read_gate,
        )

        ref = _ref(spark)  # 2000 distinct digests
        table = str(tmp_path / "cms_as")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=64)
        v = cms_rebuild(ref, table, auto_size=True)
        kind, gate_df, p = read_gate(spark, table)
        assert kind == "cms"
        # 2000 keys at target_fill 0.3 need width >= 6667 -> 64 * 2^7
        assert p["width"] == 8192 and p["n_keys"] == 2000
        assert p["est_fp"] < 0.9  # healthy again after the resize
        # v0's sidecar still resolves the ORIGINAL width — a lazy
        # reader of the old version can never pair it with the new one
        assert _params_for(table, "v0")["width"] == 64
        # no false negatives at the new width: every sketched key flags
        flagged = count_min_might_contain(
            gate_df, ref, "h", p["depth"], p["width"], seed=p["seed"],
            out_col="m",
        )
        assert flagged.filter(~F.col("m")).count() == 0
        # a subsequent batch merge builds at the RESIZED width (the
        # pointed version's sidecar, not the init-time store file)
        assert cms_batch(ref.limit(100), table, batch_id=7) == f"v{int(v[1:]) + 1}"
        _, _, p2 = read_gate(spark, table)
        assert p2["width"] == 8192

    def test_cms_rebuild_saturation_recorded(self, spark, tmp_path):
        from waterdata_spark.streaming.gates import cms_rebuild, read_gate

        ref = _ref(spark)
        table = str(tmp_path / "cms_sat")
        init_cms_store(ref.limit(0), table, "h", depth=DEPTH, width=16)
        cms_rebuild(ref, table)  # no auto_size: 2000 keys into 16 buckets
        _, _, p = read_gate(spark, table)
        assert p["width"] == 16  # unchanged without auto_size
        assert p["est_fp"] >= 0.9  # the bypass signal

    def test_bloom_rebuild_auto_size_grows_bits(self, spark, tmp_path):
        from waterdata_spark.streaming.gates import bloom_rebuild

        ref = _ref(spark)
        table = str(tmp_path / "bloom_as")
        init_bloom_store(ref.limit(0), table, "h", n_bits=1 << 10, k=K)
        bloom_rebuild(ref, table, auto_size=True)
        bf = read_bloom(table)  # serves at the resized n_bits — a
        # params/bits length mismatch would raise in from_bytes
        assert bf.n_bits > (1 << 10)
        assert bf.fill_fraction**K <= 0.02  # ~target_fp after resize
        # no false negatives
        from waterdata_spark.operators.bloom import with_bloom_contains

        assert (
            with_bloom_contains(ref, "h", bf, out_col="m")
            .filter(~F.col("m"))
            .count()
            == 0
        )
