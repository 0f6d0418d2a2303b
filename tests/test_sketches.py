"""Mergeable sketch profiling (operators/sketches.py): HLL distinct
profiles and the DataFrame-native count-min sketch.

The contract under test is the incremental-statistics one: per-shard
sketches MERGE to exactly what sketching the whole corpus yields
(counters bit-identical for CMS, estimate-identical for HLL), so a
100 TB profile updates per shard without rescanning. Plus the
published error guarantees: CMS never underestimates and stays within
eps*N with the standard probability; HLL relative error tracks its
lg_k configuration.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.sketches import (
    count_min_build,
    count_min_lookup,
    count_min_merge,
    estimate_hll_profile,
    hll_profile,
    merge_hll_profiles,
)


@pytest.fixture(scope="module")
def base(spark):
    # 20k rows, k has 3771 distinct, n has 97 distinct with 10% nulls
    return (
        spark.range(0, 20000)
        .select(
            "id",
            (F.col("id") % 3771).alias("k"),
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.col("id") % 97)
            .alias("n"),
        )
        .persist()
    )


class TestHllProfile:
    def test_counts_exact_and_estimate_close(self, spark, base):
        est = {
            r["column"]: r
            for r in estimate_hll_profile(hll_profile(base, ["k", "n"])).collect()
        }
        assert est["k"]["n_rows"] == 20000 and est["k"]["n_nulls"] == 0
        assert est["n"]["n_nulls"] == 2000
        # lg_k=12 -> ~1.6% relative standard error; allow 5%
        assert abs(est["k"]["distinct_est"] - 3771) / 3771 < 0.05
        # low cardinality is exact in the DataSketches HLL sparse mode
        assert est["n"]["distinct_est"] == 97

    def test_merge_of_shards_matches_whole_within_bound(self, spark, base):
        whole = {
            r["column"]: r
            for r in estimate_hll_profile(hll_profile(base, ["k", "n"])).collect()
        }
        parts = [
            hll_profile(base.filter(F.col("id") % 3 == i), ["k", "n"])
            for i in range(3)
        ]
        merged = {
            r["column"]: r
            for r in estimate_hll_profile(merge_hll_profiles(*parts)).collect()
        }
        exact = {"k": 3771, "n": 97}
        for c in ["k", "n"]:
            assert merged[c]["n_rows"] == whole[c]["n_rows"]
            assert merged[c]["n_nulls"] == whole[c]["n_nulls"]
            # register-wise union carries the same error guarantee as a
            # direct sketch — but NOT bit-identical estimates: sparse
            # shards can union MORE accurately than a dense direct
            # sketch. Both must sit within the lg_k=12 bound (~1.6%
            # RSE; assert 5% = ~3 sigma) of the exact count.
            assert abs(merged[c]["distinct_est"] - exact[c]) / exact[c] < 0.05
            assert abs(whole[c]["distinct_est"] - exact[c]) / exact[c] < 0.05

    def test_empty_columns_rejected(self, base):
        with pytest.raises(ValueError):
            hll_profile(base, [])


@pytest.fixture(scope="module")
def words(spark):
    # zipf-ish: value v = id % 211, so each word appears ~95 times
    return (
        spark.range(0, 20000)
        .select((F.col("id") % 211).cast("string").alias("w"))
        .persist()
    )


class TestCountMin:
    DEPTH, WIDTH = 4, 4096

    def test_never_underestimates_and_exact_when_wide(self, spark, words):
        cms = count_min_build(words, "w", self.DEPTH, self.WIDTH)
        est = count_min_lookup(cms, words.distinct(), "w", self.DEPTH, self.WIDTH)
        j = est.join(words.groupBy("w").count(), "w").collect()
        assert len(j) == 211
        assert all(r["est"] >= r["count"] for r in j)
        # 211 distinct into 4096 buckets x 4 rows: collisions practically
        # impossible per-row across all 4 rows -> min is exact
        assert all(r["est"] == r["count"] for r in j)

    def test_bounded_size(self, words):
        cms = count_min_build(words, "w", self.DEPTH, self.WIDTH)
        assert cms.count() <= self.DEPTH * self.WIDTH

    def test_merge_equals_whole_bit_identical(self, spark, words):
        whole = count_min_build(words, "w", self.DEPTH, self.WIDTH)
        parts = [
            count_min_build(
                words.filter(F.col("w").cast("int") % 2 == i), "w", self.DEPTH, self.WIDTH
            )
            for i in range(2)
        ]
        merged = count_min_merge(*parts)
        diffs = (
            merged.withColumnRenamed("cnt", "c2")
            .join(whole, ["d", "bucket"], "full")
            .filter(
                F.coalesce("cnt", F.lit(-1)) != F.coalesce("c2", F.lit(-1))
            )
            .count()
        )
        assert diffs == 0

    def test_weighted_build_equals_stream_build(self, spark, words):
        # sketching a pre-aggregated (word, count) frame with weight_col
        # produces the identical counter table
        agg = words.groupBy("w").count()
        a = count_min_build(words, "w", self.DEPTH, self.WIDTH)
        b = count_min_build(agg, "w", self.DEPTH, self.WIDTH, weight_col="count")
        diffs = (
            a.withColumnRenamed("cnt", "c2")
            .join(b, ["d", "bucket"], "full")
            .filter(F.coalesce("cnt", F.lit(-1)) != F.coalesce("c2", F.lit(-1)))
            .count()
        )
        assert diffs == 0

    def test_absent_item_estimates_zero(self, spark, words):
        cms = count_min_build(words, "w", self.DEPTH, self.WIDTH)
        items = words.sparkSession.createDataFrame([("never-seen",)], "w string")
        (row,) = count_min_lookup(cms, items, "w", self.DEPTH, self.WIDTH).collect()
        assert row["est"] == 0

    def test_error_bound_narrow_sketch(self, spark, words):
        # deliberately narrow: width=32 -> eps = e/32 ~ 0.085, N=20000
        # CMS guarantee: P(est > true + eps*N) <= exp(-depth)
        depth, width = 4, 32
        eps_n = math.e / width * 20000
        cms = count_min_build(words, "w", depth, width)
        est = count_min_lookup(cms, words.distinct(), "w", depth, width)
        j = est.join(words.groupBy("w").count(), "w").collect()
        assert all(r["est"] >= r["count"] for r in j)
        frac_beyond = sum(r["est"] > r["count"] + eps_n for r in j) / len(j)
        assert frac_beyond <= math.exp(-depth) + 0.05

    def test_null_items_ignored(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("a",)], "w string")
        cms = count_min_build(df, "w", 2, 64)
        # total weight across one hash row == 2 (the two non-null rows)
        per_row = cms.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
        assert all(r["s"] == 2 for r in per_row)

    def test_bad_params_rejected(self, words):
        with pytest.raises(ValueError):
            count_min_build(words, "w", 0, 16)
        with pytest.raises(ValueError):
            count_min_build(words, "w", 2, 0)


class TestGroupedProfile:
    def test_grouped_counts_and_merge(self, spark):
        from waterdata_spark.operators.sketches import (
            estimate_hll_profile_grouped,
            hll_profile_grouped,
            merge_hll_profiles_grouped,
        )

        df = spark.range(0, 6000).select(
            "id",
            F.concat(F.lit("l"), (F.col("id") % 3)).alias("lang"),
            (F.col("id") % 701).alias("k"),
            F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") % 11).alias("n"),
        )
        whole = {
            (r["lang"], r["column"]): r
            for r in estimate_hll_profile_grouped(
                hll_profile_grouped(df, "lang", ["k", "n"]), "lang"
            ).collect()
        }
        assert len(whole) == 6  # 3 groups x 2 columns
        for g in ["l0", "l1", "l2"]:
            assert whole[(g, "k")]["n_rows"] == 2000
            assert whole[(g, "n")]["n_nulls"] == 400
            # 701 distinct k overall; per group of 2000 rows each k mod
            # class appears — exact small-cardinality estimates
            assert abs(whole[(g, "k")]["distinct_est"] - 701) <= 701 * 0.05
            assert whole[(g, "n")]["distinct_est"] == 11

        # merge of disjoint shards == whole within the lg_k bound; a
        # group present in only one shard merges from it alone
        parts = [
            hll_profile_grouped(df.filter(F.col("id") % 2 == i), "lang", ["k", "n"])
            for i in range(2)
        ]
        merged = {
            (r["lang"], r["column"]): r
            for r in estimate_hll_profile_grouped(
                merge_hll_profiles_grouped("lang", *parts), "lang"
            ).collect()
        }
        for key, w in whole.items():
            assert merged[key]["n_rows"] == w["n_rows"]
            assert merged[key]["n_nulls"] == w["n_nulls"]
            assert (
                abs(merged[key]["distinct_est"] - w["distinct_est"])
                <= max(w["distinct_est"], 1) * 0.05
            )

    def test_group_only_in_one_shard(self, spark):
        from waterdata_spark.operators.sketches import (
            estimate_hll_profile_grouped,
            hll_profile_grouped,
            merge_hll_profiles_grouped,
        )

        a = spark.createDataFrame([("x", 1), ("x", 2)], "g string, v int")
        b = spark.createDataFrame([("y", 7)], "g string, v int")
        merged = estimate_hll_profile_grouped(
            merge_hll_profiles_grouped(
                "g",
                hll_profile_grouped(a, "g", ["v"]),
                hll_profile_grouped(b, "g", ["v"]),
            ),
            "g",
        ).collect()
        got = {(r["g"], r["column"]): (r["n_rows"], r["distinct_est"]) for r in merged}
        assert got[("x", "v")] == (2, 2) and got[("y", "v")] == (1, 1)


class TestStreamingProfile:
    COLS = ["lang", "doc_id"]

    def _docs(self, spark):
        return spark.range(0, 3000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("l"), (F.col("id") % 5)).alias("lang"),
        )

    def test_stream_equals_batch_profile(self, spark, tmp_path):
        from waterdata_spark.streaming.profile import (
            current_profile,
            init_profile,
            profile_stream_sink,
        )

        docs = self._docs(spark)
        src = str(tmp_path / "src")
        docs.repartition(6).write.parquet(src)  # 6 files -> 6 micro-batches
        table = str(tmp_path / "profile")
        init_profile(docs.limit(0), table, self.COLS)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = profile_stream_sink(stream, table, self.COLS, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        from waterdata_spark.operators.sketches import (
            estimate_hll_profile,
            hll_profile,
        )

        got = {
            r["column"]: r for r in current_profile(spark, table).collect()
        }
        want = {
            r["column"]: r
            for r in estimate_hll_profile(hll_profile(docs, self.COLS)).collect()
        }
        exact = {"lang": 5, "doc_id": 3000}
        for c in self.COLS:
            assert got[c]["n_rows"] == want[c]["n_rows"] == 3000
            assert got[c]["n_nulls"] == want[c]["n_nulls"]
            # per-batch union and whole-corpus sketch each hold the
            # lg_k error bound (not bit-identical: small batches union
            # in sparse/exact mode — see sketches.py module doc)
            assert abs(got[c]["distinct_est"] - exact[c]) / exact[c] < 0.05
            assert abs(want[c]["distinct_est"] - exact[c]) / exact[c] < 0.05

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        from waterdata_spark.streaming.profile import (
            current_profile,
            init_profile,
            profile_batch,
        )

        docs = self._docs(spark)
        table = str(tmp_path / "profile2")
        init_profile(docs.limit(0), table, self.COLS)
        assert profile_batch(docs, table, self.COLS, batch_id=0) == "v1"
        before = {
            (r["column"], r["n_rows"], r["distinct_est"])
            for r in current_profile(spark, table).collect()
        }
        # checkpoint-recovery replay of the same batch id: must skip
        assert profile_batch(docs, table, self.COLS, batch_id=0) is None
        after = {
            (r["column"], r["n_rows"], r["distinct_est"])
            for r in current_profile(spark, table).collect()
        }
        assert before == after
        # the NEXT batch applies normally
        assert profile_batch(docs, table, self.COLS, batch_id=1) == "v2"
        got = {r["column"]: r for r in current_profile(spark, table).collect()}
        assert got["doc_id"]["n_rows"] == 6000

    def test_uninitialized_raises(self, spark, tmp_path):
        from waterdata_spark.streaming.profile import current_profile, profile_batch

        with pytest.raises(RuntimeError):
            profile_batch(self._docs(spark), str(tmp_path / "nope"), self.COLS, 0)
        with pytest.raises(RuntimeError):
            current_profile(spark, str(tmp_path / "nope"))


class TestMightContain:
    DEPTH, WIDTH = 4, 4096

    def test_no_false_negatives_and_few_false_positives(self, spark):
        from waterdata_spark.operators.sketches import count_min_might_contain

        members = spark.range(0, 500).select(
            F.concat(F.lit("m"), F.col("id")).alias("k")
        )
        cms = count_min_build(members, "k", self.DEPTH, self.WIDTH)
        probes = spark.range(0, 2000).select(
            F.when(F.col("id") < 500, F.concat(F.lit("m"), F.col("id")))
            .otherwise(F.concat(F.lit("x"), F.col("id")))
            .alias("k")
        )
        got = count_min_might_contain(
            cms, probes, "k", self.DEPTH, self.WIDTH
        ).collect()
        # every member flags True (no false negative, structural)
        assert all(r["might_contain"] for r in got if r["k"].startswith("m"))
        # non-members are overwhelmingly False at this load factor
        non = [r for r in got if r["k"].startswith("x")]
        fp = sum(r["might_contain"] for r in non) / len(non)
        assert fp < 0.05

    def test_null_flags_false(self, spark):
        from waterdata_spark.operators.sketches import count_min_might_contain

        members = spark.createDataFrame([("a",)], "k string")
        cms = count_min_build(members, "k", 2, 64)
        probes = spark.createDataFrame([("a",), (None,)], "k string")
        got = {r["k"]: r["might_contain"] for r in count_min_might_contain(
            cms, probes, "k", 2, 64
        ).collect()}
        assert got["a"] is True and got[None] is False

    def test_shuffle_free_plan(self, spark):
        from waterdata_spark.operators.sketches import count_min_might_contain

        members = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        cms = count_min_build(members, "k", 2, 256)
        probes = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        plan = count_min_might_contain(cms, probes, "k", 2, 256)._jdf.queryExecution().executedPlan().toString()
        # the flag joins are broadcast hash joins; the probe side never
        # exchanges (the sketch side does — it is the bounded aggregate)
        assert "BroadcastHashJoin" in plan


class TestDedupAgainstGated:
    def test_gated_equals_plain(self, spark):
        from waterdata_spark.operators.dedup import dedup_against_exact

        corpus = spark.range(0, 1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), (F.col("id") % 700)).alias("text"),
        )
        # reference overlaps on ids 0..99 (text-0..text-99)
        reference = spark.range(0, 100).select(
            F.concat(F.lit("text-"), F.col("id")).alias("text")
        )
        plain = dedup_against_exact(corpus, reference, ["text"])
        gated = dedup_against_exact(
            corpus, reference, ["text"], prefilter="cms", prefilter_width=4096
        )
        a = sorted(r["doc_id"] for r in plain.collect())
        b = sorted(r["doc_id"] for r in gated.collect())
        assert a == b and 0 < len(a) < 1000

    def test_gated_exact_even_under_heavy_collisions(self, spark):
        # adversarially tiny sketch: every probe collides -> the gate
        # passes everything to the exact check and the result is STILL
        # exactly the plain anti-join (false positives cost time, never
        # correctness)
        from waterdata_spark.operators.dedup import dedup_against_exact

        corpus = spark.range(0, 300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), (F.col("id") % 200)).alias("text"),
        )
        reference = spark.range(0, 50).select(
            F.concat(F.lit("t"), F.col("id")).alias("text")
        )
        plain = sorted(
            r["doc_id"]
            for r in dedup_against_exact(corpus, reference, ["text"]).collect()
        )
        gated = sorted(
            r["doc_id"]
            for r in dedup_against_exact(
                corpus, reference, ["text"], prefilter="cms",
                prefilter_depth=2, prefilter_width=4,
            ).collect()
        )
        assert plain == gated

    def test_gated_with_digest_col(self, spark):
        from waterdata_spark.operators.dedup import content_digest, dedup_against_exact

        corpus = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("d"), (F.col("id") % 150)).alias("text"),
        ).withColumn("dg", content_digest(["text"]))
        reference = spark.range(0, 30).select(
            F.concat(F.lit("d"), F.col("id")).alias("text")
        ).withColumn("dg", content_digest(["text"]))
        plain = sorted(
            r["doc_id"]
            for r in dedup_against_exact(corpus, reference, [], digest_col="dg").collect()
        )
        gated = sorted(
            r["doc_id"]
            for r in dedup_against_exact(
                corpus, reference, [], digest_col="dg", prefilter="cms",
                prefilter_width=2048,
            ).collect()
        )
        assert plain == gated and "dg" in corpus.columns

    def test_bad_prefilter_rejected(self, spark):
        from waterdata_spark.operators.dedup import dedup_against_exact

        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            dedup_against_exact(df, df, ["text"], prefilter="cuckoo")
