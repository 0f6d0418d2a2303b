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

    def test_merge_of_shards_equals_whole(self, spark, base):
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
        for c in ["k", "n"]:
            assert merged[c]["n_rows"] == whole[c]["n_rows"]
            assert merged[c]["n_nulls"] == whole[c]["n_nulls"]
            # union of same-lg_k sketches estimates EXACTLY the whole
            assert merged[c]["distinct_est"] == whole[c]["distinct_est"]

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
