"""Broadcast Bloom filter (operators/bloom.py) and the bloom-gated
cross-corpus exact dedup path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_merge,
    with_bloom_contains,
)

N_BITS, K = 1 << 16, 4


@pytest.fixture(scope="module")
def members(spark):
    return spark.range(0, 5000).select(
        F.concat(F.lit("m"), F.col("id")).alias("k")
    ).persist()


class TestBloom:
    def test_no_false_negatives(self, spark, members):
        bf = bloom_build(members, "k", N_BITS, K)
        got = with_bloom_contains(members, "k", bf).collect()
        assert all(r["might_contain"] for r in got) and len(got) == 5000

    def test_fp_rate_tracks_theory(self, spark, members):
        bf = bloom_build(members, "k", N_BITS, K)
        non = spark.range(10000, 30000).select(
            F.concat(F.lit("x"), F.col("id")).alias("k")
        )
        got = with_bloom_contains(non, "k", bf).collect()
        fp = sum(r["might_contain"] for r in got) / len(got)
        theory = bf.fill_fraction ** K
        assert fp <= 3 * theory + 0.002  # generous but binding

    def test_merge_equals_whole_bit_identical(self, spark, members):
        whole = bloom_build(members, "k", N_BITS, K)
        parts = [
            bloom_build(
                members.filter(F.col("k").substr(2, 10).cast("long") % 3 == i),
                "k",
                N_BITS,
                K,
            )
            for i in range(3)
        ]
        merged = bloom_merge(*parts)
        assert (merged.bits == whole.bits).all()

    def test_bytes_round_trip(self, members):
        bf = bloom_build(members, "k", N_BITS, K)
        rt = BloomFilter.from_bytes(bf.to_bytes(), N_BITS, K, "bloom")
        assert (rt.bits == bf.bits).all()
        with pytest.raises(ValueError):
            BloomFilter.from_bytes(bf.to_bytes()[:-8], N_BITS, K, "bloom")

    def test_null_flags_false(self, spark, members):
        bf = bloom_build(members, "k", N_BITS, K)
        probes = spark.createDataFrame([("m1",), (None,)], "k string")
        got = {r["k"]: r["might_contain"] for r in with_bloom_contains(probes, "k", bf).collect()}
        assert got["m1"] is True and got[None] is False

    def test_mismatched_merge_rejected(self, members):
        a = bloom_build(members, "k", N_BITS, K)
        b = bloom_build(members, "k", N_BITS, K, seed="other")
        with pytest.raises(ValueError):
            bloom_merge(a, b)
        with pytest.raises(ValueError):
            bloom_merge()

    def test_param_validation(self, members):
        with pytest.raises(ValueError):
            bloom_build(members, "k", 0, 4)
        with pytest.raises(ValueError):
            bloom_build(members, "k", 64, 0)

    def test_high_bit_positions_exercise_word_boundaries(self, spark):
        # tiny filter: every word bit position 0..63 must be settable
        # (the int-typed shiftleft would wrap at bit 31)
        vals = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
        bf = bloom_build(vals, "k", 128, 2)  # 2 words, saturated
        assert bf.fill_fraction > 0.9
        got = with_bloom_contains(vals, "k", bf).collect()
        assert all(r["might_contain"] for r in got)


class TestBloomGatedDedup:
    def test_gated_equals_plain(self, spark):
        from waterdata_spark.operators.dedup import dedup_against_exact

        corpus = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), (F.col("id") % 700)).alias("text"),
        )
        reference = spark.range(0, 100).select(
            F.concat(F.lit("text-"), F.col("id")).alias("text")
        )
        plain = sorted(
            r["doc_id"]
            for r in dedup_against_exact(corpus, reference, ["text"]).collect()
        )
        gated = sorted(
            r["doc_id"]
            for r in dedup_against_exact(
                corpus, reference, ["text"], prefilter="bloom", bloom_bits=1 << 14
            ).collect()
        )
        assert plain == gated and 0 < len(plain) < 1000

    def test_prebuilt_filter_reused(self, spark):
        from waterdata_spark.operators.dedup import content_digest, dedup_against_exact

        corpus = spark.range(0, 400).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("d"), (F.col("id") % 300)).alias("text"),
        ).withColumn("dg", content_digest(["text"]))
        reference = spark.range(0, 50).select(
            F.concat(F.lit("d"), F.col("id")).alias("text")
        ).withColumn("dg", content_digest(["text"]))
        bf = bloom_build(
            reference.select("dg").distinct(), "dg", 1 << 14, 4, seed="xgate"
        )
        plain = sorted(
            r["doc_id"]
            for r in dedup_against_exact(corpus, reference, [], digest_col="dg").collect()
        )
        gated = sorted(
            r["doc_id"]
            for r in dedup_against_exact(
                corpus, reference, [], digest_col="dg",
                prefilter="bloom", prefilter_bloom=bf,
            ).collect()
        )
        assert plain == gated
