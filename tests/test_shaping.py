"""Training-data shaping operators: token-window chunking, fixed-budget
sequence packing, deterministic (stratified) sampling. All pure-JVM
plans; the tests pin semantics, determinism under repartitioning, and
the documented waste/stability bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
    pack_sequences_bfd,
)
from waterdata_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    stratified_sample_exact,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "a b c"),
        (3, ""),
        (4, "   "),
        (5, "single"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunking:
    def test_windows_cover_and_order(self, spark, docs):
        out = chunk_documents(docs, max_tokens=4).orderBy("doc_id", "chunk_idx").collect()
        d1 = [r for r in out if r["doc_id"] == 1]
        assert [r["chunk_idx"] for r in d1] == [0, 1, 2]
        assert [r["n_chunk_tokens"] for r in d1] == [4, 4, 2]
        assert d1[0]["chunk_text"] == "t0 t1 t2 t3"
        assert d1[2]["chunk_text"] == "t8 t9"
        # empty / whitespace-only docs produce no chunks
        assert {r["doc_id"] for r in out} == {1, 2, 5}

    def test_zero_overlap_reconstructs_tokens(self, spark, docs):
        rows = chunk_documents(docs, max_tokens=3).collect()
        got: dict[int, str] = {}
        for r in sorted(rows, key=lambda x: (x["doc_id"], x["chunk_idx"])):
            got[r["doc_id"]] = (got.get(r["doc_id"], "") + " " + r["chunk_text"]).strip()
        assert got[1] == " ".join(f"t{i}" for i in range(10))
        assert got[2] == "a b c"

    def test_overlap_stride(self, spark, docs):
        out = (
            chunk_documents(docs.filter("doc_id = 1"), max_tokens=4, overlap=2)
            .orderBy("chunk_idx")
            .collect()
        )
        # stride 2: windows at 0,2,4,6 cover all 10 tokens
        assert [r["chunk_text"].split()[0] for r in out] == ["t0", "t2", "t4", "t6"]
        assert out[-1]["chunk_text"] == "t6 t7 t8 t9"

    def test_no_shuffle_plan(self, spark, docs):
        plan = chunk_documents(docs, max_tokens=4)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_bad_overlap_raises(self, docs):
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=4, overlap=4)


class TestPacking:
    @pytest.fixture()
    def corpus(self, spark):
        import random

        r = random.Random(11)
        rows = [(i, " ".join("w" for _ in range(r.randint(1, 40)))) for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_waste_bound_and_totals(self, spark, corpus):
        budget = 64
        out = pack_sequences(corpus, budget_tokens=budget, n_streams=4)
        max_doc = out.agg(F.max("n_tokens")).first()[0]
        bins = out.groupBy("stream_id", "bin_id").agg(
            F.sum("n_tokens").alias("tot"), F.first("bin_tokens").alias("reported")
        )
        bad = bins.filter((F.col("tot") != F.col("reported")) | (F.col("tot") >= budget + max_doc))
        assert bad.count() == 0

    def test_deterministic_under_repartition(self, spark, corpus):
        a = {
            (r["doc_id"]): (r["stream_id"], r["bin_id"])
            for r in pack_sequences(corpus.repartition(3), budget_tokens=64, n_streams=4).collect()
        }
        b = {
            (r["doc_id"]): (r["stream_id"], r["bin_id"])
            for r in pack_sequences(corpus.repartition(7), budget_tokens=64, n_streams=4).collect()
        }
        assert a == b

    def test_default_args_deterministic(self, spark, corpus):
        # the default n_streams is a FIXED constant (DEFAULT_PACK_STREAMS),
        # not a function of cluster parallelism — so a default-argument
        # call must give identical assignments regardless of how the
        # input is partitioned (the observable proxy for cluster size in
        # a single-JVM test; defaultParallelism is pinned per JVM, so
        # cluster-size independence reduces to: no sparkContext lookup
        # in the default + partitioning independence, both pinned here)
        from waterdata_spark.operators.chunking import DEFAULT_PACK_STREAMS

        a = {
            r["doc_id"]: (r["stream_id"], r["bin_id"])
            for r in pack_sequences(corpus.repartition(2)).collect()
        }
        b = {
            r["doc_id"]: (r["stream_id"], r["bin_id"])
            for r in pack_sequences(corpus.repartition(13)).collect()
        }
        c = {
            r["doc_id"]: (r["stream_id"], r["bin_id"])
            for r in pack_sequences(corpus, n_streams=DEFAULT_PACK_STREAMS).collect()
        }
        assert a == b == c
        assert DEFAULT_PACK_STREAMS == 256  # the documented contract value

    def test_oversized_doc_gets_own_bin(self, spark):
        rows = [(1, " ".join("w" for _ in range(100))), (2, "w w"), (3, "w w w")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = pack_sequences(df, budget_tokens=10, n_streams=1).collect()
        big_bin = next(r for r in out if r["doc_id"] == 1)["bin_id"]
        assert all(r["bin_id"] != big_bin for r in out if r["doc_id"] != 1)


class TestPackingBfd:
    @pytest.fixture()
    def corpus(self, spark):
        import random

        r = random.Random(23)
        rows = [(i, " ".join("w" for _ in range(r.randint(1, 40)))) for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_no_bin_exceeds_budget(self, spark, corpus):
        budget = 64
        out = pack_sequences_bfd(corpus, budget_tokens=budget, n_streams=4)
        bins = out.groupBy("stream_id", "bin_id").agg(
            F.sum("n_tokens").alias("tot"), F.first("bin_tokens").alias("reported")
        )
        assert bins.filter(F.col("tot") != F.col("reported")).count() == 0
        # every doc here is <= 40 tokens < budget, so NO bin may overflow
        assert bins.filter(F.col("tot") > budget).count() == 0

    def test_bfd_bound_vs_optimal(self, spark, corpus):
        # BFD uses at most 11/9 * OPT + 1 bins; OPT >= ceil(total/budget)
        budget = 64
        out = pack_sequences_bfd(corpus, budget_tokens=budget, n_streams=4)
        per_stream = (
            out.groupBy("stream_id")
            .agg(
                F.countDistinct("bin_id").alias("bins"),
                F.sum("n_tokens").alias("tot"),
            )
            .collect()
        )
        import math

        for r in per_stream:
            lower = math.ceil(r["tot"] / budget)
            assert r["bins"] <= math.ceil(11 / 9 * lower) + 1

    def test_differential_vs_quadratic_best_fit(self, spark, corpus):
        # independent O(n*bins) reimplementation: scan ALL open bins,
        # choose the tightest fit, lowest bin id on capacity ties
        budget = 64
        out = pack_sequences_bfd(corpus, budget_tokens=budget, n_streams=4)
        rows = sorted(
            ((r["stream_id"], r["doc_id"], r["n_tokens"], r["bin_id"]) for r in out.collect())
        )
        from collections import defaultdict

        by_stream = defaultdict(list)
        for sid, did, n, b in rows:
            by_stream[sid].append((did, n, b))
        for sid, items in by_stream.items():
            order = sorted(items, key=lambda t: (-t[1], t[0]))
            caps: list[int] = []  # remaining capacity per bin id
            expect = {}
            for did, n, _ in order:
                best = None
                for b, rem in enumerate(caps):
                    if rem >= n and (best is None or rem < caps[best]):
                        best = b
                if n <= budget and best is not None:
                    caps[best] -= n
                    expect[did] = best
                else:
                    caps.append(max(0, budget - n))
                    expect[did] = len(caps) - 1
            got = {did: b for did, n, b in items}
            assert got == expect

    def test_deterministic_under_repartition(self, spark, corpus):
        a = {
            r["doc_id"]: (r["stream_id"], r["bin_id"])
            for r in pack_sequences_bfd(
                corpus.repartition(3), budget_tokens=64, n_streams=4
            ).collect()
        }
        b = {
            r["doc_id"]: (r["stream_id"], r["bin_id"])
            for r in pack_sequences_bfd(
                corpus.repartition(7), budget_tokens=64, n_streams=4
            ).collect()
        }
        assert a == b

    def test_oversized_doc_gets_own_bin(self, spark):
        rows = [(1, " ".join("w" for _ in range(100))), (2, "w w"), (3, "w w w")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = pack_sequences_bfd(df, budget_tokens=10, n_streams=1).collect()
        big = next(r for r in out if r["doc_id"] == 1)
        assert big["bin_tokens"] == 100
        assert all(r["bin_id"] != big["bin_id"] for r in out if r["doc_id"] != 1)

    def test_same_stream_assignment_as_cumsum_pack(self, spark, corpus):
        # both packers share the stream hash: a corpus packs into the
        # same streams either way (only the bin layout differs)
        a = {r["doc_id"]: r["stream_id"] for r in pack_sequences(corpus, n_streams=8).collect()}
        b = {r["doc_id"]: r["stream_id"] for r in pack_sequences_bfd(corpus, n_streams=8).collect()}
        assert a == b

    def test_payload_never_enters_pandas_group(self, spark, corpus):
        # VERDICT r10 item 2: the packing pass must run on the
        # (id, n_tokens, stream_id) projection — a document payload in
        # the applyInPandas group is a per-task corpus/n_streams x
        # full-text pandas allocation (~400 GB at 100 TB with the 256
        # default streams). Assert the FlatMapGroupsInPandas node's
        # schema carries no text column.
        out = pack_sequences_bfd(corpus, budget_tokens=64, n_streams=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        pandas_lines = [
            ln for ln in plan.splitlines() if "FlatMapGroupsInPandas" in ln
        ]
        assert len(pandas_lines) == 1
        assert "text" not in pandas_lines[0]
        # extra columns ride along through the join-back, still slim
        wide = pack_sequences_bfd(
            corpus.withColumn("meta", F.repeat(F.lit("m"), 5)),
            budget_tokens=64,
            n_streams=4,
        )
        plan_w = wide._jdf.queryExecution().executedPlan().toString()
        ln = next(l for l in plan_w.splitlines() if "FlatMapGroupsInPandas" in l)
        assert "text" not in ln and "meta" not in ln
        assert set(wide.columns) == {
            "doc_id", "text", "meta", "n_tokens", "stream_id", "bin_id", "bin_tokens"
        }


class TestBatchByLength:
    @pytest.fixture()
    def corpus(self, spark):
        import random

        r = random.Random(7)
        rows = [(i, " ".join("w" for _ in range(r.randint(1, 60)))) for i in range(400)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_batches_sized_sorted_and_deterministic(self, spark, corpus):
        from collections import defaultdict

        from waterdata_spark.operators.chunking import batch_by_length

        out = batch_by_length(corpus, batch_size=8, n_streams=4).collect()
        assert len(out) == 400
        batches = defaultdict(list)
        for r in out:
            batches[(r["stream_id"], r["batch_id"])].append(r)
        for (sid, bid), rows in batches.items():
            assert len(rows) <= 8
            assert max(r["n_tokens"] for r in rows) == rows[0]["batch_max_tokens"]
            assert all(r["batch_max_tokens"] == rows[0]["batch_max_tokens"] for r in rows)
        # only the LAST batch of a stream may be short
        for sid in {s for s, _ in batches}:
            bids = sorted(b for s, b in batches if s == sid)
            for b in bids[:-1]:
                assert len(batches[(sid, b)]) == 8
        # within a stream, batch ids follow the global length order:
        # every doc in batch b is >= every doc in batch b+1
        for sid in {s for s, _ in batches}:
            bids = sorted(b for s, b in batches if s == sid)
            for a, b in zip(bids, bids[1:]):
                lo = min(r["n_tokens"] for r in batches[(sid, a)])
                hi = max(r["n_tokens"] for r in batches[(sid, b)])
                assert lo >= hi
        # deterministic under repartitioning
        again = {
            r["doc_id"]: (r["stream_id"], r["batch_id"])
            for r in batch_by_length(
                corpus.repartition(7), batch_size=8, n_streams=4
            ).collect()
        }
        for r in out:
            assert again[r["doc_id"]] == (r["stream_id"], r["batch_id"])

    def test_length_batching_cuts_padding_vs_arrival_order(self, spark, corpus):
        # the operator's reason to exist: padding waste must beat
        # batching in arrival (id) order on the same streams
        from waterdata_spark.operators.chunking import batch_by_length

        out = batch_by_length(corpus, batch_size=8, n_streams=4)
        waste = out.agg(
            F.sum(F.col("batch_max_tokens") - F.col("n_tokens"))
        ).first()[0]
        naive = (
            out.select("doc_id", "n_tokens", "stream_id")
            .withColumn(
                "batch_id",
                F.expr(
                    "(row_number() over (partition by stream_id order by doc_id) - 1) div 8"
                ),
            )
            .withColumn(
                "m",
                F.expr("max(n_tokens) over (partition by stream_id, batch_id)"),
            )
            .agg(F.sum(F.col("m") - F.col("n_tokens")))
            .first()[0]
        )
        assert waste < naive * 0.5  # at least 2x less padding

    def test_validation(self, spark, corpus):
        from waterdata_spark.operators.chunking import batch_by_length

        with pytest.raises(ValueError):
            batch_by_length(corpus, batch_size=0)


class TestSentenceChunking:
    def test_sentences_never_cut_and_budget_respected(self, spark):
        from waterdata_spark.operators.chunking import chunk_documents_sentences

        text = (
            "One two three four. Five six seven eight nine ten! "
            "Eleven twelve? Thirteen fourteen fifteen. Sixteen."
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = sorted(
            chunk_documents_sentences(df, max_tokens=6).collect(),
            key=lambda r: r["chunk_idx"],
        )
        # every sentence appears intact in exactly one chunk
        joined = " ".join(r["chunk_text"] for r in out)
        for s in [
            "One two three four.",
            "Five six seven eight nine ten!",
            "Eleven twelve?",
            "Thirteen fourteen fifteen.",
            "Sixteen.",
        ]:
            assert s in joined
        # running-sum convention: a chunk overflows only by its boundary
        # sentence (longest sentence = 6 tokens), never more
        assert all(r["n_chunk_tokens"] <= 6 + 6 for r in out)
        assert sum(r["n_sentences"] for r in out) == 5

    def test_long_sentence_stays_intact(self, spark):
        # a sentence far over the budget is NEVER split: it rides in the
        # chunk where it starts (the running-sum convention), and the
        # next chunk resumes at the following sentence boundary
        from waterdata_spark.operators.chunking import chunk_documents_sentences

        long_sent = " ".join(f"w{i}" for i in range(30))
        text = f"Short one. {long_sent}. Tail two."
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_documents_sentences(df, max_tokens=8).collect()
        holders = [r for r in out if long_sent in r["chunk_text"]]
        assert len(holders) == 1  # intact, in exactly one chunk
        tail = [r for r in out if "Tail two." in r["chunk_text"]]
        assert len(tail) == 1 and tail[0]["chunk_idx"] > holders[0]["chunk_idx"]

    def test_deterministic_under_repartition(self, spark):
        from waterdata_spark.operators.chunking import chunk_documents_sentences

        rows = [
            (i, ". ".join(f"s{i} w{j} x{j} y{j}" for j in range(10)) + ".")
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, chunk_documents_sentences(df.repartition(3), max_tokens=9).collect()))
        b = sorted(map(tuple, chunk_documents_sentences(df.repartition(11), max_tokens=9).collect()))
        assert a == b

    def test_empty_and_validation(self, spark):
        from waterdata_spark.operators.chunking import chunk_documents_sentences

        df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
        assert chunk_documents_sentences(df).count() == 0
        with pytest.raises(ValueError):
            chunk_documents_sentences(df, max_tokens=0)


class TestPackOffsets:
    @pytest.fixture()
    def corpus(self, spark):
        import random

        r = random.Random(31)
        rows = [(i, " ".join("w" for _ in range(r.randint(1, 40)))) for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _check_contiguous(self, rows):
        from collections import defaultdict

        bins = defaultdict(list)
        for r in rows:
            bins[(r["stream_id"], r["bin_id"])].append(r)
        for key, docs in bins.items():
            docs.sort(key=lambda r: r["offset"])
            pos = 0
            for d in docs:
                assert d["offset"] == pos, (key, d)
                pos += d["n_tokens"]
            assert pos == docs[0]["bin_tokens"]

    def test_offsets_contiguous_cumsum_pack(self, corpus):
        from waterdata_spark.operators.chunking import pack_offsets

        packed = pack_sequences(corpus, budget_tokens=64, n_streams=4)
        self._check_contiguous(pack_offsets(packed).collect())

    def test_offsets_contiguous_bfd_and_bounded(self, corpus):
        from waterdata_spark.operators.chunking import pack_offsets

        packed = pack_sequences_bfd(corpus, budget_tokens=64, n_streams=4)
        rows = pack_offsets(packed).collect()
        self._check_contiguous(rows)
        # BFD bins respect capacity, so every doc fits inside the budget
        assert all(r["offset"] + r["n_tokens"] <= 64 for r in rows)

    def test_bin_manifest_round_trip(self, corpus):
        from waterdata_spark.operators.chunking import bin_manifest

        packed = pack_sequences_bfd(corpus, budget_tokens=64, n_streams=4)
        mans = bin_manifest(packed).collect()
        n_docs = 0
        for m in mans:
            docs = m["docs"]
            n_docs += len(docs)
            assert [d["offset"] for d in docs] == sorted(d["offset"] for d in docs)
            assert sum(d["n_tokens"] for d in docs) == m["bin_tokens"]
            assert docs[0]["offset"] == 0
        assert n_docs == packed.count()


class TestCapPerGroup:
    @pytest.fixture()
    def skewed(self, spark):
        # group 'hot' has 200 rows, 'a'/'b' have 5 and 12
        return spark.range(0, 217).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 5, "a")
            .when(F.col("id") < 17, "b")
            .otherwise("hot")
            .alias("g"),
            (F.col("id") % 50).cast("double").alias("score"),
        )

    def test_semantics_equal_plain_row_number(self, spark, skewed):
        from pyspark.sql import Window

        from waterdata_spark.operators.sampling import _hash_u, cap_per_group

        cap = 20
        got = sorted(
            r["doc_id"] for r in cap_per_group(skewed, "g", cap, id_col="doc_id").collect()
        )
        ranked = skewed.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("g").orderBy(
                    _hash_u("doc_id", "cap42"), F.col("doc_id")
                )
            ),
        )
        want = sorted(r["doc_id"] for r in ranked.filter(F.col("rn") <= cap).collect())
        assert got == want

    def test_under_cap_groups_untouched(self, skewed):
        from waterdata_spark.operators.sampling import cap_per_group

        out = cap_per_group(skewed, "g", 20, id_col="doc_id")
        per = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert per == {"a": 5, "b": 12, "hot": 20}

    def test_order_by_keeps_best(self, skewed):
        from waterdata_spark.operators.sampling import cap_per_group

        out = cap_per_group(
            skewed, "g", 10, id_col="doc_id", order_by=[F.col("score").desc()]
        )
        hot_scores = sorted(
            (r["score"] for r in out.filter(F.col("g") == "hot").collect()),
            reverse=True,
        )
        # 200 hot rows cover scores 0..49 four times each; the top 10 by
        # score desc (id tiebreak) are four 49s, four 48s, two 47s
        assert hot_scores == [49.0] * 4 + [48.0] * 4 + [47.0] * 2

    def test_flag_mode_preserves_rows(self, skewed):
        from waterdata_spark.operators.sampling import cap_per_group

        out = cap_per_group(skewed, "g", 20, id_col="doc_id", mode="flag")
        assert out.count() == 217
        kept = out.filter("kept").count()
        assert kept == 5 + 12 + 20

    def test_deterministic_under_repartition(self, skewed):
        from waterdata_spark.operators.sampling import cap_per_group

        a = sorted(
            r["doc_id"]
            for r in cap_per_group(skewed.repartition(3), "g", 15, id_col="doc_id").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in cap_per_group(skewed.repartition(11), "g", 15, id_col="doc_id").collect()
        )
        assert a == b

    def test_growth_never_promotes(self, spark, skewed):
        # adding corpus rows can push an existing row OUT (outranked)
        # but can never pull a previously-dropped row IN
        from waterdata_spark.operators.sampling import cap_per_group

        extra = spark.range(300, 400).select(
            F.col("id").alias("doc_id"), F.lit("hot").alias("g"),
            F.lit(0.0).alias("score"),
        )
        kept_a = {
            r["doc_id"] for r in cap_per_group(skewed, "g", 20, id_col="doc_id").collect()
        }
        kept_ab = {
            r["doc_id"]
            for r in cap_per_group(
                skewed.unionByName(extra), "g", 20, id_col="doc_id"
            ).collect()
        }
        old_ids = {r["doc_id"] for r in skewed.collect()}
        assert (kept_ab & old_ids) <= kept_a

    def test_window_plan_equivalent(self, skewed):
        from waterdata_spark.operators.sampling import cap_per_group

        a = sorted(
            r["doc_id"] for r in cap_per_group(skewed, "g", 15, id_col="doc_id").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in cap_per_group(
                skewed, "g", 15, id_col="doc_id", plan="window"
            ).collect()
        )
        assert a == b
        # flag mode too
        fa = {
            r["doc_id"]: r["kept"]
            for r in cap_per_group(skewed, "g", 15, id_col="doc_id", mode="flag").collect()
        }
        fb = {
            r["doc_id"]: r["kept"]
            for r in cap_per_group(
                skewed, "g", 15, id_col="doc_id", mode="flag", plan="window"
            ).collect()
        }
        assert fa == fb

    def test_validation(self, skewed):
        from waterdata_spark.operators.sampling import cap_per_group

        with pytest.raises(ValueError):
            cap_per_group(skewed, "g", 0, id_col="doc_id")
        with pytest.raises(ValueError):
            cap_per_group(skewed, "g", 5, id_col="doc_id", mode="nope")
        with pytest.raises(ValueError):
            cap_per_group(skewed, "g", 5, id_col="doc_id", plan="nope")


class TestSampling:
    @pytest.fixture()
    def ids(self, spark):
        return spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "es").otherwise("fr").alias("lang"),
        )

    def test_assign_split_group_stable_and_frozen(self, spark, ids):
        """assign_split (r9): every row of a group carries the SAME
        split (the leakage guarantee); proportions land near the
        weights; growing the corpus never flips an existing group; and
        degenerate weights raise."""
        from waterdata_spark.operators.sampling import assign_split

        g = ids.withColumn("grp", F.expr("doc_id div 5"))
        out = assign_split(g, {"train": 0.8, "val": 0.1, "test": 0.1}, "grp")
        rows = out.collect()
        by_grp: dict = {}
        for r in rows:
            by_grp.setdefault(r["grp"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_grp.values())  # leakage-safe
        counts = {s: 0 for s in ("train", "val", "test")}
        for r in rows:
            counts[r["split"]] += 1
        assert 0.7 < counts["train"] / len(rows) < 0.9
        assert counts["val"] > 0 and counts["test"] > 0
        # frozen property: a grown corpus preserves existing assignments
        grown = ids.sparkSession.range(4000).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        ).withColumn("grp", F.expr("doc_id div 5"))
        out2 = {
            r["doc_id"]: r["split"]
            for r in assign_split(
                grown, {"train": 0.8, "val": 0.1, "test": 0.1}, "grp"
            ).collect()
        }
        for r in rows:
            assert out2[r["doc_id"]] == r["split"]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            assign_split(g, {}, "grp")
        with _pytest.raises(ValueError):
            assign_split(g, {"a": -1.0, "b": 2.0}, "grp")

    def test_empty_fractions_dict_selects_nothing(self, spark, ids):
        """{} means every stratum is missing → rate 0.0 → empty result
        (not a createDataFrame schema-inference crash)."""
        out = stratified_sample(ids, "lang", {}, id_col="doc_id")
        assert out.count() == 0
        assert out.columns == ids.columns

    def test_fraction_and_repartition_stability(self, spark, ids):
        got = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.25).collect()}
        again = {r["doc_id"] for r in hash_sample(ids.repartition(13), "doc_id", 0.25).collect()}
        assert got == again
        assert 0.20 < len(got) / 2000 < 0.30

    def test_threshold_monotone_supersets(self, spark, ids):
        """Growing the rate only ADDS rows — the property that lets a
        frozen 1% eval split stay frozen inside a later 10% split."""
        s10 = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.10).collect()}
        s25 = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.25).collect()}
        assert s10 <= s25

    def test_stratified_rates(self, spark, ids):
        out = stratified_sample(ids, "lang", {"en": 1.0, "es": 0.0}, id_col="doc_id")
        by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by.get("en") == 667  # every en row kept
        assert "es" not in by  # rate 0
        assert "fr" not in by  # missing stratum -> 0 (sampleBy contract)

    def test_stratified_exact(self, spark, ids):
        out = stratified_sample_exact(ids, "lang", 50, id_col="doc_id")
        by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by == {"en": 50, "es": 50, "fr": 50}
        again = stratified_sample_exact(ids.repartition(9), "lang", 50, id_col="doc_id")
        assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}

    def test_stratified_int_keys(self, spark):
        """Integer stratum labels must not be coerced through strings."""
        df = spark.range(300).select(
            F.col("id").alias("doc_id"), (F.col("id") % 2).cast("int").alias("label")
        )
        out = stratified_sample(df, "label", {0: 1.0, 1: 0.0}, id_col="doc_id")
        got = {r["label"] for r in out.collect()}
        assert got == {0} and out.count() == 150

    def test_mixture_rates_alpha(self, spark, ids):
        from waterdata_spark.operators.sampling import mixture_rates

        counts = {"en": 1000, "es": 100, "fr": 10}
        natural = mixture_rates(counts)  # alpha=1: keep everything
        assert all(abs(v - 1.0) < 1e-9 for v in natural.values())
        flat = mixture_rates(counts, target_rows=300, alpha=0.0)  # uniform weights
        # equal weights -> 100 expected rows per source, capped at fr's size
        assert abs(flat["en"] - 0.1) < 1e-9 and abs(flat["es"] - 1.0) < 1e-9 and flat["fr"] == 1.0
        # alpha between: small sources upweighted relative to natural
        mid = mixture_rates(counts, target_rows=200, alpha=0.5)
        assert mid["fr"] > mid["es"] > mid["en"]
        # composes with the deterministic stratified sampler
        df = spark.range(1110).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 1000, "en").when(F.col("id") < 1100, "es").otherwise("fr").alias("lang"),
        )
        out = stratified_sample(df, "lang", mixture_rates(counts, 300, 0.0), id_col="doc_id")
        by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by["fr"] == 10 and by["es"] == 100 and 70 < by["en"] < 130


class TestTokenizerPlugin:
    def test_bpe_tokenizer_chunking(self, spark):
        """Chunk budgets follow the pluggable tokenizer: 'a1-b2' is one
        whitespace token but five BPE-ish pieces."""
        from waterdata_spark.functions.text import bpe_tokens

        df = spark.createDataFrame([(1, "a1-b2 c3")], "doc_id long, text string")
        ws = chunk_documents(df, max_tokens=4).collect()
        assert len(ws) == 1 and ws[0]["n_chunk_tokens"] == 2  # 2 whitespace tokens
        bpe = chunk_documents(df, max_tokens=4, tokenizer=bpe_tokens).orderBy("chunk_idx").collect()
        # pieces: a 1 - b 2 c 3 → windows of 4: [a 1 - b], [2 c 3]
        assert [r["n_chunk_tokens"] for r in bpe] == [4, 3]
        assert bpe[0]["chunk_text"] == "a 1 - b"


class TestSamplingPlans:
    def test_stratified_rates_join_is_broadcast(self, spark):
        """The per-stratum rates frame is |strata| rows — it must ride a
        broadcast, never shuffle the corpus."""
        df = spark.range(10000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 5).cast("int").alias("label")
        )
        out = stratified_sample(df, "label", {i: 0.5 for i in range(5)}, id_col="doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestImportanceResampling:
    """DSIR-style data selection (operators/selection.py)."""

    def test_differential_vs_python_reference_on_documents(self, spark):
        """importance_weights on the md5 hash path must match a pure-
        Python reimplementation (hashlib md5 buckets, dict unigram
        models) exactly — run on the real documents table with a real
        target slice, so tokenization, bucketing, smoothing and the
        log-ratio sum are all pinned, not just plausible."""
        import hashlib
        import math
        import re

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.selection import importance_weights
        from waterdata_spark.schemas import load_table

        B, ALPHA = 1000, 1.0
        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        target = docs.filter(F.col("doc_id") % 9 == 1).select("text")

        def grams(text):
            toks = [t for t in re.split(r"\s+", text.strip(" ")) if t != ""]
            return toks + [" ".join(p) for p in zip(toks, toks[1:])]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        t_rows = [r["text"] for r in target.collect()]
        tc, rc = {}, {}
        for text in t_rows:
            for g in grams(text):
                b = bucket(g)
                tc[b] = tc.get(b, 0) + 1
        for _, text in rows:
            for g in grams(text):
                b = bucket(g)
                rc[b] = rc.get(b, 0) + 1
        nt, nr = sum(tc.values()), sum(rc.values())
        dt, dr = math.log(nt + ALPHA * B), math.log(nr + ALPHA * B)

        def w(text):
            return sum(
                math.log(tc.get(bucket(g), 0) + ALPHA)
                - dt
                - math.log(rc.get(bucket(g), 0) + ALPHA)
                + dr
                for g in grams(text)
            )

        want = {did: w(text) for did, text in rows}
        got = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(
                docs, target, n_buckets=B, alpha=ALPHA, hash_fn="md5"
            ).collect()
        }
        assert set(got) == set(want)
        for did in want:
            assert got[did] == pytest.approx(want[did], rel=1e-9, abs=1e-9), did

    def test_target_like_documents_outrank_off_target(self, spark):
        """The weight must separate: corpus docs sharing the target's
        vocabulary score above docs from a disjoint vocabulary — on
        BOTH hash paths."""
        from waterdata_spark.operators.selection import importance_weights

        target = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta " * 5) for i in range(5)],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma delta " * 8), (2, "one two three four " * 8)],
            "doc_id long, text string",
        )
        for hash_fn in ("xx", "md5"):
            got = {
                r["doc_id"]: r["log_w"]
                for r in importance_weights(
                    corpus, target, n_buckets=512, hash_fn=hash_fn
                ).collect()
            }
            assert got[1] > got[2], hash_fn

    def test_resample_deterministic_and_partition_stable(self, spark):
        """Gumbel-top-k selection: same seed → same set, independent
        of input partitioning; different seed → (here) different set;
        k rows returned."""
        from waterdata_spark.operators.selection import importance_resample

        target = spark.createDataFrame(
            [(0, "red green blue cyan magenta yellow " * 4)],
            "doc_id long, text string",
        )
        rows = [
            (i, ("red green blue " if i % 3 == 0 else "dog cat emu ") * 6)
            for i in range(60)
        ]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        pick = lambda df, seed: sorted(
            r["doc_id"]
            for r in importance_resample(
                df, target, k=10, seed=seed, n_buckets=512
            ).collect()
        )
        a = pick(corpus, "s1")
        b = pick(corpus.repartition(7), "s1")
        c = pick(corpus, "s2")
        assert a == b and len(a) == 10
        assert a != c
        # selection is weight-biased: most picks are target-like docs
        assert sum(1 for d in a if d % 3 == 0) >= 7

    def test_empty_and_null_text_weight_zero(self, spark):
        from waterdata_spark.operators.selection import importance_weights

        target = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, ""), (2, None), (3, "x y z x y z"), (4, "p q r p q r")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(corpus, target, n_buckets=64).collect()
        }
        # no grams -> exactly the neutral weight; target-vocabulary doc
        # outranks the off-vocabulary doc (absolute sign is relative to
        # the raw model, which here is the corpus itself)
        assert got[1] == 0.0 and got[2] == 0.0
        assert got[3] > got[4]

    def test_weight_plan_shape(self, spark):
        """100 TB guards: the ratio join must broadcast (the ratio
        frame is ≤ n_buckets rows) and the per-doc sum must be a
        partial (map-side) aggregate — no sort-merge join anywhere."""
        from waterdata_spark.operators.selection import importance_weights

        corpus = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), (F.col("id") % 7).cast("string")).alias("text"),
        )
        target = corpus.limit(10).select("text")
        out = importance_weights(corpus, target, n_buckets=256)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_decimal_round_mode_close_to_float_and_partition_exact(self, spark):
        """decimal_round=7 (the oracle determinism contract, r8):
        weights stay within n_grams*5e-8 of the float path, and are
        EXACTLY bit-equal across repartitionings (decimal sums are
        order-independent; float sums only approximately so)."""
        from waterdata_spark.operators.selection import importance_weights

        target = spark.createDataFrame(
            [(0, "red green blue cyan magenta yellow " * 4)],
            "doc_id long, text string",
        )
        rows = [
            (i, ("red green blue " if i % 3 == 0 else "dog cat emu ") * 6)
            for i in range(40)
        ]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        f = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(corpus, target, n_buckets=512).collect()
        }
        d = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(
                corpus, target, n_buckets=512, decimal_round=7
            ).collect()
        }
        assert set(f) == set(d)
        for k in f:
            assert abs(f[k] - d[k]) < 1e-4, k
        d2 = {
            r["doc_id"]: r["log_w"]
            for r in importance_weights(
                corpus.repartition(7), target, n_buckets=512, decimal_round=7
            ).collect()
        }
        assert d == d2  # bit-exact, not approx

    def test_temperature_zero_is_pure_topk(self, spark):
        """temperature=0 (r8): the argmax limit — selection IS the
        top-k by weight with id tie-break, no noise; verified against
        an explicit sort of the weight frame."""
        from waterdata_spark.operators.selection import (
            importance_resample,
            importance_weights,
        )

        target = spark.createDataFrame(
            [(0, "red green blue cyan magenta yellow " * 4)],
            "doc_id long, text string",
        )
        rows = [
            (i, ("red green blue " if i % 3 == 0 else "dog cat emu ") * 6)
            for i in range(60)
        ]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            r["doc_id"]
            for r in importance_resample(
                corpus, target, k=10, temperature=0, n_buckets=512,
                decimal_round=7,
            ).collect()
        )
        w = importance_weights(corpus, target, n_buckets=512, decimal_round=7)
        want = sorted(
            r["doc_id"]
            for r in w.orderBy(
                F.col("log_w").desc(), F.col("doc_id").asc()
            ).limit(10).collect()
        )
        assert got == want
        # every selected doc is target-like (weight dominates, no noise)
        assert all(i % 3 == 0 for i in got)


class TestLmPerplexity:
    """CCNet-style hashed-bigram perplexity scoring
    (operators/selection.lm_perplexity)."""

    B, ALPHA, INTERP = 4096, 0.1, 0.3

    def test_differential_vs_python_reference_on_documents(self, spark):
        """md5 path vs a pure-Python reimplementation of the
        interpolated hashed-bigram LM on real documents: per-doc mean
        negative log prob equal to 1e-9."""
        import hashlib
        import math
        import re

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.selection import lm_perplexity
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        ref = docs.filter(F.col("doc_id") % 4 == 1).select("text")

        def toks(t):
            return [x for x in re.split(r"\s+", t.strip(" ")) if x != ""]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % self.B

        uc, bc = {}, {}
        n_ref = 0
        for r in ref.collect():
            ts = [bucket(t) for t in toks(r["text"])]
            n_ref += len(ts)
            for b in ts:
                uc[b] = uc.get(b, 0) + 1
            for b1, b2 in zip(ts, ts[1:]):
                bc[(b1, b2)] = bc.get((b1, b2), 0) + 1
        denom_u = math.log(n_ref + self.ALPHA * self.B)

        def score(text):
            ts = [bucket(t) for t in toks(text)]
            if len(ts) < 2:
                return None
            tot = 0.0
            for b1, b2 in zip(ts, ts[1:]):
                p_uni = math.exp(math.log(uc.get(b2, 0) + self.ALPHA) - denom_u)
                p_big = (bc.get((b1, b2), 0) + self.ALPHA) / (
                    uc.get(b1, 0) + self.ALPHA * self.B
                )
                tot += -math.log(self.INTERP * p_uni + (1 - self.INTERP) * p_big)
            return tot / (len(ts) - 1)

        want = {r["doc_id"]: score(r["text"]) for r in docs.collect()}
        got = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(
                docs, ref, n_buckets=self.B, alpha=self.ALPHA,
                interp=self.INTERP, hash_fn="md5",
            ).collect()
        }
        assert set(got) == set(want)
        for did, w in want.items():
            if w is None:
                assert got[did] is None, did
            else:
                assert got[did] == pytest.approx(w, rel=1e-9), did

    def test_kn_differential_vs_python_reference_on_documents(self, spark):
        """smoothing='kn' (r10 — interpolated bigram Kneser-Ney, the
        KenLM/CCNet smoothing) vs a pure-Python reimplementation on
        real documents, md5 path: per-doc mean NLL equal to 1e-9; the
        unguarded per-context distribution sums to 1 (the KN mass
        identity); repartitioned corpus scores identical."""
        import hashlib
        import math
        import re

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.selection import lm_perplexity
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        ref = docs.filter(F.col("doc_id") % 4 == 1).select("text")

        def toks(t):
            return [x for x in re.split(r"\s+", t.strip(" ")) if x != ""]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % self.B

        bc: dict = {}
        for r in ref.collect():
            ts = [bucket(t) for t in toks(r["text"])]
            for b1, b2 in zip(ts, ts[1:]):
                bc[(b1, b2)] = bc.get((b1, b2), 0) + 1
        B = len(bc)
        n1 = sum(1 for c in bc.values() if c == 1)
        n2 = sum(1 for c in bc.values() if c == 2)
        D = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) else 0.5
        cl: dict = {}
        nl: dict = {}
        nr: dict = {}
        for (b1, b2), c in bc.items():
            cl[b1] = cl.get(b1, 0) + c
            nl[b1] = nl.get(b1, 0) + 1
            nr[b2] = nr.get(b2, 0) + 1
        V = len(nr)

        def p_cont(b2, alpha):
            return (nr.get(b2, 0) + alpha) / (B + alpha * V)

        def p_kn(b1, b2, alpha):
            pc = p_cont(b2, alpha)
            if b1 not in cl:
                return pc
            return max(bc.get((b1, b2), 0) - D, 0) / cl[b1] + D * nl[b1] / cl[b1] * pc

        # the KN mass identity: with alpha=0 the per-context
        # distribution over SEEN right buckets sums to exactly 1
        for ctx in list(cl)[:5]:
            assert sum(p_kn(ctx, w, 0.0) for w in nr) == pytest.approx(1.0, abs=1e-9)

        def score(text):
            ts = [bucket(t) for t in toks(text)]
            if len(ts) < 2:
                return None
            return sum(
                -math.log(p_kn(b1, b2, self.ALPHA)) for b1, b2 in zip(ts, ts[1:])
            ) / (len(ts) - 1)

        want = {r["doc_id"]: score(r["text"]) for r in docs.collect()}
        got = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(
                docs, ref, n_buckets=self.B, alpha=self.ALPHA,
                hash_fn="md5", smoothing="kn",
            ).collect()
        }
        assert set(got) == set(want)
        for did, w in want.items():
            if w is None:
                assert got[did] is None, did
            else:
                assert got[did] == pytest.approx(w, rel=1e-9), did
        again = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(
                docs.repartition(7), ref, n_buckets=self.B, alpha=self.ALPHA,
                hash_fn="md5", smoothing="kn",
            ).collect()
        }
        for did in want:
            assert again[did] == pytest.approx(got[did], rel=1e-12) if got[did] is not None else again[did] is None

    def test_frozen_tables_score_equals_lm_perplexity(self, spark):
        """score_lm ∘ fit_lm_tables (r10 — the streaming-gate frozen
        form) must equal lm_perplexity EXACTLY for both smoothings and
        both rounding modes (the two code paths share formulas; this
        pin is the contract that keeps them together)."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.selection import (
            fit_lm_tables,
            lm_perplexity,
            score_lm,
        )
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        ref = docs.filter(F.col("doc_id") % 4 == 1).select("text")
        for smoothing in ("jm", "kn"):
            for dr in (None, 7):
                want = {
                    r["doc_id"]: r["log_ppl"]
                    for r in lm_perplexity(
                        docs, ref, n_buckets=self.B, alpha=self.ALPHA,
                        interp=self.INTERP, hash_fn="md5",
                        smoothing=smoothing, decimal_round=dr,
                    ).collect()
                }
                tables = fit_lm_tables(
                    ref, n_buckets=self.B, alpha=self.ALPHA,
                    interp=self.INTERP, hash_fn="md5", smoothing=smoothing,
                )
                got = {
                    r["doc_id"]: r["log_ppl"]
                    for r in score_lm(docs, tables, decimal_round=dr).collect()
                }
                assert got == want, (smoothing, dr)

    def test_kn_laws_and_validation(self, spark):
        """KN mode: reference-like beats gibberish on both hash paths,
        <2-token null contract, unknown smoothing and bigram-free
        reference raise."""
        from waterdata_spark.operators.selection import lm_perplexity

        ref = spark.createDataFrame(
            [(i, "the water quality report shows safe levels today " * 6)
             for i in range(4)],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "the water quality report shows safe levels today " * 4),
                (2, "zqx vbn mlk poi uyt rew qas dfg hjk " * 4),
                (3, "one"),
            ],
            "doc_id long, text string",
        )
        for hash_fn in ("xx", "md5"):
            got = {
                r["doc_id"]: r["log_ppl"]
                for r in lm_perplexity(
                    corpus, ref.select("text"), hash_fn=hash_fn, smoothing="kn"
                ).collect()
            }
            assert got[1] < got[2], hash_fn
            assert got[3] is None, hash_fn
        with pytest.raises(ValueError, match="smoothing"):
            lm_perplexity(corpus, ref.select("text"), smoothing="katz")
        single = spark.createDataFrame([("one",), ("two",)], "text string")
        with pytest.raises(ValueError, match="no bigrams"):
            lm_perplexity(corpus, single, smoothing="kn")

    def test_reference_like_scores_lower_than_gibberish(self, spark):
        from waterdata_spark.operators.selection import lm_perplexity

        ref = spark.createDataFrame(
            [(i, "the water quality report shows safe levels today " * 6)
             for i in range(4)],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "the water quality report shows safe levels today " * 4),
                (2, "zqx vbn mlk poi uyt rew qas dfg hjk " * 4),
                (3, "one"),  # single token -> no bigram evidence
            ],
            "doc_id long, text string",
        )
        for hash_fn in ("xx", "md5"):
            got = {
                r["doc_id"]: r["log_ppl"]
                for r in lm_perplexity(
                    corpus, ref.select("text"), hash_fn=hash_fn
                ).collect()
            }
            assert got[1] < got[2], hash_fn
            assert got[3] is None, hash_fn

    def test_plan_broadcasts_model_tables(self, spark):
        from waterdata_spark.operators.selection import lm_perplexity

        corpus = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("a b c d"), (F.col("id") % 5).cast("string")).alias("text"),
        )
        plan = (
            lm_perplexity(corpus, corpus.select("text"), n_buckets=1024)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the MODEL-table joins (bigram + 2x unigram) must broadcast;
        # the one permitted sort-merge is the final corpus <- scores
        # join on doc_id, which is legitimately SMJ when both sides
        # are big
        assert plan.count("BroadcastHashJoin") >= 3
        assert plan.count("SortMergeJoin") <= 1

    def test_over_threshold_reference_falls_back_to_shuffle_join(self, spark):
        """The broadcast bound is enforced, not assumed (VERDICT r7
        item 4): with max_broadcast_rows below the model-table sizes,
        no model join broadcasts — and the scores are identical."""
        from waterdata_spark.operators.selection import lm_perplexity

        corpus = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("a b c d"), (F.col("id") % 5).cast("string")).alias("text"),
        )
        # disable stats-based auto-broadcast: at real scale the model
        # tables exceed the threshold anyway; here they are tiny, so
        # only the (absent) hint could broadcast them
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = lm_perplexity(
                corpus, corpus.select("text"), n_buckets=1024, max_broadcast_rows=0
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        want = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(
                corpus, corpus.select("text"), n_buckets=1024
            ).collect()
        }
        got = {r["doc_id"]: r["log_ppl"] for r in out.collect()}
        assert got == pytest.approx(want)

    def test_decimal_round_mode_close_and_partition_exact(self, spark):
        """decimal_round=7 (the x30 oracle contract, r8): log_ppl
        stays within rounding distance of the float path, null
        contract unchanged, and the score is EXACTLY bit-equal across
        repartitionings (decimal NLL sums are order-independent)."""
        from waterdata_spark.operators.selection import lm_perplexity

        ref = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog " * 3)
             for i in range(4)],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps " * 4),
                (2, "zeta eta theta iota kappa " * 4),
                (3, "one"),          # <2 tokens -> null
                (4, None),           # null text -> null
            ],
            "doc_id long, text string",
        )
        f = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(corpus, ref.select("text"), n_buckets=1024).collect()
        }
        d = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(
                corpus, ref.select("text"), n_buckets=1024, decimal_round=7
            ).collect()
        }
        assert d[3] is None and d[4] is None
        assert d[1] == pytest.approx(f[1], abs=1e-5)
        assert d[2] == pytest.approx(f[2], abs=1e-5)
        assert d[1] < d[2]  # reference-like still beats gibberish
        d2 = {
            r["doc_id"]: r["log_ppl"]
            for r in lm_perplexity(
                corpus.repartition(5), ref.select("text"),
                n_buckets=1024, decimal_round=7,
            ).collect()
        }
        assert d == d2


class TestUpsample:
    def test_integer_rates_exact_and_tagged(self, spark):
        from waterdata_spark.operators.sampling import upsample

        df = spark.createDataFrame([(i, "s") for i in range(50)], "doc_id long, src string")
        out = upsample(df, 2.0, "doc_id").collect()
        assert len(out) == 100
        per = {}
        for r in out:
            per.setdefault(r["doc_id"], []).append(r["replica"])
        assert all(sorted(v) == [0, 1] for v in per.values())

    def test_fractional_rate_expected_multiplicity(self, spark):
        """rate 2.3: every row twice, a deterministic ~30% a third
        time — total within a loose concentration bound, exact
        replica sets {0,1} or {0,1,2}."""
        from waterdata_spark.operators.sampling import upsample

        n = 2000
        df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        out = upsample(df, 2.3, "doc_id").collect()
        per = {}
        for r in out:
            per.setdefault(r["doc_id"], []).append(r["replica"])
        assert all(sorted(v) in ([0, 1], [0, 1, 2]) for v in per.values())
        total = len(out)
        assert abs(total - 2.3 * n) < 4 * (0.3 * 0.7 * n) ** 0.5 + 1

    def test_per_stratum_dict_and_zero_rate(self, spark):
        from waterdata_spark.operators.sampling import upsample

        df = spark.createDataFrame(
            [(i, ["wiki", "crawl", "junk"][i % 3]) for i in range(300)],
            "doc_id long, src string",
        )
        out = upsample(df, {"wiki": 3.0, "crawl": 1.0}, "doc_id", strata_col="src")
        rows = out.collect()
        by_src = {}
        for r in rows:
            by_src[r["src"]] = by_src.get(r["src"], 0) + 1
        assert by_src["wiki"] == 300 and by_src["crawl"] == 100
        assert "junk" not in by_src  # missing stratum -> rate 0

    def test_deterministic_and_partition_stable(self, spark):
        from waterdata_spark.operators.sampling import upsample

        df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        key = lambda rows: sorted((r["doc_id"], r["replica"]) for r in rows)
        a = key(upsample(df, 1.4, "doc_id").collect())
        b = key(upsample(df.repartition(13), 1.4, "doc_id").collect())
        c = key(upsample(df, 1.4, "doc_id", seed="other").collect())
        assert a == b
        assert a != c

    def test_negative_rate_raises(self, spark):
        """floor(-0.5) = -1 would walk F.sequence backwards into a
        phantom replica tagged -1 (ADVICE r7) — both the scalar and
        dict paths reject negatives up front."""
        from waterdata_spark.operators.sampling import upsample

        df = spark.createDataFrame([(1, "s")], "doc_id long, src string")
        with pytest.raises(ValueError, match=">= 0"):
            upsample(df, -0.5, "doc_id")
        with pytest.raises(ValueError, match=">= 0"):
            upsample(df, {"s": -1.0}, "doc_id", strata_col="src")

    def test_mixture_rates_uncapped_feeds_upsample(self, spark):
        from waterdata_spark.operators.sampling import mixture_rates, upsample

        counts = {"wiki": 100, "crawl": 10_000}
        rates = mixture_rates(counts, target_rows=10_100, alpha=0.5, cap=False)
        assert rates["wiki"] > 1.0  # alpha<1 upweights the small source
        capped = mixture_rates(counts, target_rows=10_100, alpha=0.5)
        assert capped["wiki"] == 1.0
        df = spark.createDataFrame(
            [(i, "wiki" if i < 100 else "crawl") for i in range(10_100)],
            "doc_id long, src string",
        )
        out = upsample(df, rates, "doc_id", strata_col="src")
        total = out.count()
        assert abs(total - 10_100) < 200  # expected total == target


class TestBpe:
    """Distributed BPE vocabulary training + encoding (operators/bpe;
    Sennrich 2016). No oracle row — iterative training is the
    documented non-SQL-expressible class; verification is an exact
    differential vs an INDEPENDENT naive implementation plus laws."""

    @staticmethod
    def _naive_merges(counts: dict, n: int) -> list:
        """Independent reference: dict-of-tuples representation (the
        module uses mutated lists), Counter-based pair counting."""
        from collections import Counter

        vocab = {
            tuple(w[:-1]) + (w[-1] + "</w>",): c for w, c in counts.items() if w
        }
        merges = []
        for _ in range(n):
            pc: Counter = Counter()
            for syms, c in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += c
            if not pc:
                break
            best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            if pc[best] < 2:
                break
            merges.append(best)
            new_vocab = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and syms[i] == best[0]
                        and syms[i + 1] == best[1]
                    ):
                        out.append(best[0] + best[1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
            vocab = new_vocab
        return merges

    PAPER = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    def test_merge_loop_matches_independent_reference(self):
        from waterdata_spark.operators.bpe import train_bpe_merges

        for counts in (
            self.PAPER,
            {"aaa": 4, "aab": 3, "abab": 2, "b": 9},
            {"x": 1},
            {},
        ):
            for n in (0, 1, 3, 10, 50):
                assert train_bpe_merges(counts, n) == self._naive_merges(
                    counts, n
                ), (counts, n)

    def test_incremental_trainer_randomized_differential(self):
        """r10: the trainer is now incremental (pair→word index + lazy
        heap). Stress it against the naive recount twin on random
        small-alphabet corpora — a 2-3 letter alphabet forces deep
        merge chains, heavy tie-breaking, and the symbol-recreation
        edge where a fully-merged pair resurfaces."""
        import random

        from waterdata_spark.operators.bpe import train_bpe_merges

        rng = random.Random(42)
        for trial in range(12):
            alpha = "ab" if trial % 2 else "abc"
            counts = {
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))): rng.randint(1, 9)
                for _ in range(rng.randint(5, 60))
            }
            n = rng.choice([1, 5, 20, 200])
            assert train_bpe_merges(counts, n) == self._naive_merges(
                counts, n
            ), (trial, counts, n)

    def test_paper_example_first_merges(self):
        """Sennrich §3.2's corpus: 'es' dominates (newest 6 + widest 3
        = 9 weighted pairs) — the first merges must build 'est</w>'."""
        from waterdata_spark.operators.bpe import train_bpe_merges

        m = train_bpe_merges(self.PAPER, 3)
        assert m[0] == ("e", "s")
        assert m[1] == ("es", "t</w>")

    def test_train_encode_roundtrip_on_documents(self, spark):
        """Train on real documents; encoding must (a) reproduce the
        normalized text through decode_symbols for every doc, (b) be
        identical under repartitioning (training aggregate order-
        independence + deterministic tie-breaks)."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.bpe import (
            BPEModel,
            decode_symbols,
            encode_bpe,
            train_bpe,
        )

        d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        ).filter(F.col("text").isNotNull()).limit(80)
        model = train_bpe(d, n_merges=60, min_count=1)
        assert 0 < len(model.merges) <= 60
        m2 = train_bpe(d.repartition(13), n_merges=60, min_count=1)
        assert model.merges == m2.merges
        # exact JSON round-trip
        assert BPEModel.from_json(model.to_json()).merges == model.merges

        enc = encode_bpe(d, model)
        rows = enc.collect()
        import re

        for r in rows:
            norm = re.sub(r"\s+", " ", r["text"].lower()).strip()
            assert decode_symbols(r["bpe"]) == norm, r["doc_id"]
        # encoding of a training word reproduces the training-time
        # segmentation (train/encode consistency law)
        enc2 = {r["doc_id"]: r["bpe"] for r in encode_bpe(d.repartition(7), model).collect()}
        for r in rows:
            assert enc2[r["doc_id"]] == r["bpe"]

    def test_word_counts_differential_and_min_count(self, spark):
        from collections import Counter

        from waterdata_spark.operators.bpe import word_counts

        df = spark.createDataFrame(
            [(1, "The cat sat"), (2, "the CAT ran"), (3, None)],
            "doc_id long, text string",
        )
        got = {r["word"]: r["count"] for r in word_counts(df, "text").collect()}
        want = Counter("the cat sat the cat ran".split())
        assert got == dict(want)
        pruned = {
            r["word"]: r["count"]
            for r in word_counts(df, "text", min_count=2).collect()
        }
        assert pruned == {"the": 2, "cat": 2}

    def test_empty_vocab_raises(self, spark):
        import pytest as _pytest

        from waterdata_spark.operators.bpe import train_bpe

        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="empty vocabulary"):
            train_bpe(df, min_count=5)


class TestUnigramLm:
    """SentencePiece-style unigram-LM tokenizer (operators/unigram_lm,
    r9) — the other published subword family next to BPE."""

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_em_differential_vs_enumeration(self, spark):
        """One EM round's expected counts match an INDEPENDENT pure-
        Python implementation that enumerates every segmentation of
        every word explicitly (exponential, fine for short words) —
        a genuinely different formulation than the module's lattice
        forward-backward."""
        import itertools
        import math

        from waterdata_spark.operators.bpe import word_counts
        from waterdata_spark.operators.unigram_lm import (
            WB,
            _expected_counts,
            seed_pieces,
        )

        docs = self._docs(
            spark,
            ["the cat sat", "the cat ran", "a cat sat on the mat", "the the"],
        )
        wc = word_counts(docs, min_count=1)
        seed = {
            r["piece"]: float(r["weight"])
            for r in seed_pieces(wc, max_piece_len=4, seed_size=100).collect()
        }
        tot = sum(seed.values())
        logp = {p: math.log(w / tot) for p, w in seed.items()}

        got = {
            r["piece"]: r["c"]
            for r in _expected_counts(wc, logp, 4, round_dp=9)
        }

        def segmentations(w):
            # all ways to split w into vocab pieces of len <= 4
            if not w:
                yield []
                return
            for l in range(1, min(4, len(w)) + 1):
                if w[:l] in logp:
                    for rest in segmentations(w[l:]):
                        yield [w[:l]] + rest

        counts = {r["word"]: int(r["count"]) for r in wc.collect()}
        want: dict = {}
        for w, c in counts.items():
            segs = list(segmentations(WB + w))
            probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
            z = sum(probs)
            per_word: dict = {}
            for s, pr in zip(segs, probs):
                for p in s:
                    per_word[p] = per_word.get(p, 0.0) + pr / z
            for p, e in per_word.items():
                want[p] = want.get(p, 0.0) + round(e * c, 9)
        for p in want:
            assert got.get(p, 0.0) == pytest.approx(want[p], abs=1e-6), p

    def test_train_is_partitioning_invariant_and_roundtrips(self, spark):
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.unigram_lm import (
            UnigramModel,
            train_unigram,
        )
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        a = train_unigram(docs, vocab_size=120, max_piece_len=4, min_count=1)
        b = train_unigram(
            docs.repartition(7), vocab_size=120, max_piece_len=4, min_count=1
        )
        assert a.to_json() == b.to_json()
        assert len(a.logp) <= 120
        rt = UnigramModel.from_json(a.to_json())
        assert rt.to_json() == a.to_json()
        # probabilities normalize
        import math

        assert sum(math.exp(v) for v in a.logp.values()) == pytest.approx(1.0, abs=1e-9)

    def test_removal_loss_differential_vs_enumeration(self):
        """_piece_removal_loss (r10 prune_mode='loss', Kudo §3.2) ==
        expected-count × (logp − best alternative score) where the
        alternative is found by EXHAUSTIVE enumeration of every
        segmentation of the piece's string that is not the piece
        itself — an independent formulation of the DP."""
        import itertools
        import math

        from waterdata_spark.operators.unigram_lm import _piece_removal_loss

        logp = {
            "a": math.log(0.3),
            "b": math.log(0.2),
            "ab": math.log(0.25),
            "ba": math.log(0.05),
            "aba": math.log(0.1),
            "c": math.log(0.1),
        }
        floor = min(logp.values()) - 1.0

        def enum_alt(p, max_len):
            best = None
            L = len(p)
            for cuts in itertools.product([0, 1], repeat=L - 1):
                segs, start = [], 0
                for i, cut in enumerate(cuts, 1):
                    if cut:
                        segs.append(p[start:i])
                        start = i
                segs.append(p[start:])
                if segs == [p] or any(len(s) > max_len for s in segs):
                    continue
                score = 0.0
                ok = True
                for s in segs:
                    lp = logp.get(s)
                    if lp is None:
                        if len(s) > 1:
                            ok = False
                            break
                        lp = floor
                    score += lp
                if ok and (best is None or score > best):
                    best = score
            return best

        for p in ["ab", "ba", "aba", "abc", "aq"]:
            lp_p = logp.get(p)
            if lp_p is None:
                continue
            want = math.exp(lp_p) * (lp_p - enum_alt(p, 3))
            got = _piece_removal_loss(p, logp, 3)
            assert got == pytest.approx(want, rel=1e-12), p

    def test_prune_mode_loss_laws(self, spark):
        """prune_mode='loss': fit is partition-invariant, hits the
        vocab budget, round-trips encode∘decode, and actually ranks
        differently from the default count mode on a corpus built so a
        frequent-but-redundant piece exists; an unknown mode raises and
        the default is unchanged."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.unigram_lm import (
            decode_pieces,
            encode_unigram,
            train_unigram,
        )
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(80)
        a = train_unigram(
            docs, vocab_size=120, max_piece_len=4, min_count=1, prune_mode="loss"
        )
        b = train_unigram(
            docs.repartition(7),
            vocab_size=120,
            max_piece_len=4,
            min_count=1,
            prune_mode="loss",
        )
        assert a.to_json() == b.to_json()
        assert len(a.logp) <= 120
        out = encode_unigram(docs, a).collect()
        for r in out:
            assert decode_pieces(r["pieces"]) == " ".join(r["text"].lower().split())
        # the rankings genuinely differ: a high-probability piece whose
        # string re-segments almost as well without it ('ab' = 'a'+'b')
        # outranks 'xy' by count but loses to it by removal loss
        import math

        from waterdata_spark.operators.unigram_lm import _piece_removal_loss

        toy = {
            "a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.2),
            "x": math.log(0.05), "y": math.log(0.05), "xy": math.log(0.1),
        }
        by_count = sorted(["ab", "xy"], key=lambda p: (-toy[p], p))
        by_loss = sorted(
            ["ab", "xy"], key=lambda p: (-_piece_removal_loss(p, toy, 4), p)
        )
        assert by_count == ["ab", "xy"] and by_loss == ["xy", "ab"]
        with pytest.raises(ValueError, match="prune_mode"):
            train_unigram(docs, vocab_size=120, prune_mode="viterbi")

    def test_encode_decode_roundtrip_on_documents(self, spark):
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.unigram_lm import (
            decode_pieces,
            encode_unigram,
            train_unigram,
        )
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(80)
        model = train_unigram(docs, vocab_size=150, max_piece_len=4, min_count=1)
        out = {
            r["doc_id"]: (r["text"], r["pieces"])
            for r in encode_unigram(docs, model).collect()
        }
        for _, (text, pieces) in out.items():
            want = " ".join(text.lower().split())
            assert decode_pieces(pieces) == want

    def test_viterbi_prefers_learned_pieces_and_unknown_chars_pass(self, spark):
        import math

        from waterdata_spark.operators.unigram_lm import (
            UnigramModel,
            encode_unigram,
            viterbi_word,
        )

        # a vocabulary where "▁unbelievable" segments as ▁un|believ|able
        logp = {p: math.log(0.2) for p in ["▁un", "believ", "able"]}
        for ch in "▁unbelivace xyzq":
            logp.setdefault(ch, math.log(1e-4))
        assert viterbi_word("▁unbelievable", logp, 8) == ["▁un", "believ", "able"]
        # unknown char (not in vocab at all) passes through
        model = UnigramModel(logp=logp, max_piece_len=8)
        df = spark.createDataFrame([(1, "unbelievable Ω")], "doc_id long, text string")
        got = encode_unigram(df, model).first()["pieces"]
        assert got[:3] == ["▁un", "believ", "able"]
        assert "ω" in "".join(got)  # default lowercase: Ω → ω, passes through

    def test_empty_and_null_contracts(self, spark):
        from waterdata_spark.operators.unigram_lm import (
            UnigramModel,
            encode_unigram,
            train_unigram,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="empty vocabulary"):
            train_unigram(empty, vocab_size=10, min_count=1)
        model = UnigramModel(logp={"a": 0.0}, max_piece_len=2)
        row = encode_unigram(
            spark.createDataFrame([(1, None)], "doc_id long, text string"), model
        ).first()
        assert row["pieces"] is None


class TestQuantileBuckets:
    """CCNet head/middle/tail bucketing (operators/selection.
    quantile_buckets; Wenzek 2020 §4.3). Exact mode is additionally
    oracle-backed as x30's 'ppl_bucket' column."""

    @staticmethod
    def _naive(rows, n, group=True):
        """Independent NTILE: SQL-standard — first (count % n) buckets
        get one extra row; order by (score, id)."""
        from collections import defaultdict

        out = {}
        groups = defaultdict(list)
        for rid, g, s in rows:
            if s is not None:
                groups[g if group else 0].append((s, rid))
        for g, items in groups.items():
            items.sort()
            cnt = len(items)
            base, extra = divmod(cnt, n)
            pos = 0
            for b in range(1, n + 1):
                size = base + (1 if b <= extra else 0)
                for _ in range(size):
                    out[items[pos][1]] = b
                    pos += 1
        return out

    def _rows(self):
        import random

        rng = random.Random(11)
        # duplicate scores on purpose — ties break by id
        return [
            (i, ["en", "fr", "zh"][i % 3], float(rng.randrange(0, 40)))
            for i in range(200)
        ] + [(900, "en", None), (901, "qq", None)]

    def test_exact_matches_independent_ntile(self, spark):
        from waterdata_spark.operators.selection import quantile_buckets

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
        for n in (2, 3, 5):
            got = {
                r["doc_id"]: r["bucket"]
                for r in quantile_buckets(
                    df, "s", n_buckets=n, group_col="lang"
                ).collect()
            }
            want = self._naive(rows, n)
            for rid, _, s in rows:
                assert got[rid] == (str(want[rid]) if s is not None else None), (
                    n,
                    rid,
                )

    def test_exact_partition_invariance_and_labels(self, spark):
        from waterdata_spark.operators.selection import quantile_buckets

        rows = self._rows()
        df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
        lbl = ["head", "middle", "tail"]
        a = {
            r["doc_id"]: r["bucket"]
            for r in quantile_buckets(
                df, "s", group_col="lang", labels=lbl
            ).collect()
        }
        b = {
            r["doc_id"]: r["bucket"]
            for r in quantile_buckets(
                df.repartition(13), "s", group_col="lang", labels=lbl
            ).collect()
        }
        assert a == b
        assert set(a.values()) == {"head", "middle", "tail", None}
        # bucket 1 = lowest scores = CCNet head
        en = [(s, i) for i, g, s in rows if g == "en" and s is not None]
        best = min(en)[1]
        assert a[best] == "head"
        assert a[900] is None and a[901] is None

    def test_sampled_full_fraction_equals_exact(self, spark):
        from waterdata_spark.operators.selection import quantile_buckets

        # distinct scores: threshold assignment has no boundary ties
        rows = [(i, "en" if i % 2 == 0 else "fr", float(i) * 1.5) for i in range(90)]
        rows += [(900, "en", None)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
        lbl = ["head", "middle", "tail"]
        a = {
            r["doc_id"]: r["bucket"]
            for r in quantile_buckets(df, "s", group_col="lang", labels=lbl).collect()
        }
        b = {
            r["doc_id"]: r["bucket"]
            for r in quantile_buckets(
                df,
                "s",
                group_col="lang",
                labels=lbl,
                mode="sampled",
                sample_fraction=1.01,
            ).collect()
        }
        assert a == b

    def test_sampled_plan_has_no_corpus_window(self, spark):
        """Production contract: assignment side is broadcast join +
        CASE — the full-corpus frame never rides a Window."""
        from waterdata_spark.operators.selection import quantile_buckets

        rows = [(i, "en", float(i)) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
        out = quantile_buckets(
            df, "s", group_col="lang", mode="sampled", sample_fraction=0.2
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one Window (over the SAMPLE) and one broadcast join;
        # the unsampled corpus reaches only scan/filter/project nodes
        assert plan.count("Window") <= 1
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    def test_sampled_thresholds_near_exact(self, spark):
        from waterdata_spark.operators.selection import quantile_buckets

        rows = [(i, "en", float(i)) for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
        got = quantile_buckets(
            df, "s", group_col="lang", mode="sampled", sample_fraction=0.3,
        )
        sizes = {
            r["bucket"]: r["n"]
            for r in got.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # 3 buckets of ~1000 ± sampling error
        assert set(sizes) == {"1", "2", "3"}
        for v in sizes.values():
            assert abs(v - 1000) < 200, sizes

    def test_validation(self, spark):
        from waterdata_spark.operators.selection import quantile_buckets

        df = spark.createDataFrame([(1, 1.0)], "doc_id long, s double")
        with pytest.raises(ValueError):
            quantile_buckets(df, "s", n_buckets=1)
        with pytest.raises(ValueError):
            quantile_buckets(df, "s", labels=["a"])
        with pytest.raises(ValueError):
            quantile_buckets(df, "s", mode="bogus")


class TestBpePackCompose:
    """End-to-end tokenizer path: train BPE on the corpus, encode, pack
    by BPE token budget — the advertised composition of the two
    shaping stages (operators/bpe + operators/chunking)."""

    def test_tokenize_then_pack(self, spark):
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.bpe import encode_bpe, train_bpe
        from waterdata_spark.operators.chunking import pack_sequences

        d = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("text").isNotNull())
            .limit(120)
        )
        model = train_bpe(d, n_merges=50, min_count=1)
        enc = encode_bpe(d, model)
        budget = 64
        packed = pack_sequences(
            enc, tokenizer=lambda c: F.col("bpe"), budget_tokens=budget
        )
        rows = packed.collect()
        assert {r["doc_id"] for r in rows} == {
            r["doc_id"] for r in d.collect()
        }  # every doc packed exactly once
        assert len(rows) == len({r["doc_id"] for r in rows})
        # n_tokens is the BPE length, not the whitespace length
        for r in rows:
            assert r["n_tokens"] == len(r["bpe"])
        # waste bound: a bin holding >1 doc overflows only by its
        # boundary-crossing doc
        from collections import defaultdict

        bins = defaultdict(list)
        for r in rows:
            bins[(r["stream_id"], r["bin_id"])].append(r["n_tokens"])
        for sizes in bins.values():
            if len(sizes) > 1:
                assert sum(sizes) - max(sizes) < budget
        # deterministic under repartitioning
        again = {
            r["doc_id"]: (r["stream_id"], r["bin_id"])
            for r in pack_sequences(
                encode_bpe(d.repartition(9), model),
                tokenizer=lambda c: F.col("bpe"),
                budget_tokens=budget,
            ).collect()
        }
        for r in rows:
            assert again[r["doc_id"]] == (r["stream_id"], r["bin_id"])

    @pytest.mark.parametrize("packer", ["cumsum", "bfd"])
    def test_full_release_path(self, spark, tmp_path, packer):
        """VERDICT r9 item 6 + r10 items 1/8 — the whole release chain
        on real documents: curate_corpus → train BPE → vocab artifact →
        encode token IDS → pack (both packers — the BFD leg exercises
        the zero-overflow contract on real curated docs) → loader bins
        with offsets → near-dup components → leakage-safe assign_split
        → write_training_shards carrying the id arrays. Pins (a) id
        decode round-trip of every curated doc THROUGH the shard
        read-back, (b) every near-dup component landing in ONE split,
        (c) rebuild-identical manifests AND byte-identical shard files
        across two builds."""
        import hashlib

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.bpe import train_bpe
        from waterdata_spark.operators.chunking import (
            pack_sequences,
            pack_sequences_bfd,
        )
        from waterdata_spark.operators.dedup_approx import (
            jaccard_verify_pairs,
            min_id_components,
            minhash_candidate_pairs,
        )
        from waterdata_spark.operators.sampling import assign_split
        from waterdata_spark.operators.vocab import (
            Vocab,
            alphabet_of,
            bpe_vocab,
            decode_ids,
            encode_bpe_ids,
            pack_bins_ids,
        )
        from waterdata_spark.pipelines.curate import curate_corpus
        from waterdata_spark.sources.shards import write_training_shards

        base = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("text").isNotNull() & (F.length("text") > 80))
            .limit(60)
        )
        rows = base.collect()
        # plant: one exact dup (curate must drop it) and three near-dup
        # variants (curate with near_dup off must KEEP them; the split
        # must then hold each variant with its source)
        planted = [(90_000, rows[0]["text"])] + [
            (90_001 + i, r["text"] + " tail marker xyz")
            for i, r in enumerate(rows[1:4])
        ]
        docs = base.unionByName(
            spark.createDataFrame(planted, "doc_id long, text string")
        )
        res = curate_corpus(docs, exact_dedup=True, near_dup=False)
        curated = res.df.select("doc_id", "text")
        n_curated = curated.count()
        assert n_curated == len(rows) + len(planted) - 1  # exact dup gone

        # tokenize to INTEGER IDS via the vocab artifact (r11): the
        # artifact itself must survive a JSON round-trip (what ships
        # next to the release) and decode every document back exactly
        model = train_bpe(curated, n_merges=80, min_count=1)
        vocab = Vocab.from_json(
            bpe_vocab(model, alphabet_of(curated)).to_json()
        )
        enc = encode_bpe_ids(curated, model, vocab)
        for r in enc.collect():
            assert decode_ids(r["input_ids"], vocab, "bpe") == " ".join(
                r["text"].lower().split()
            )

        # pack ON THE ID ARRAYS: every curated doc packed exactly once;
        # the loader bins concatenate aligned with the reported budget
        budget = 256
        pack = pack_sequences if packer == "cumsum" else pack_sequences_bfd
        packed = pack(
            enc, text_col="input_ids", tokenizer=lambda c: F.col(c),
            budget_tokens=budget,
        ).persist()
        assert packed.count() == n_curated
        bins = pack_bins_ids(packed).persist()
        assert (
            bins.filter(F.size("input_ids") != F.col("bin_tokens")).count() == 0
        )
        if packer == "bfd":
            # the capacity contract on real curated docs: no multi-doc
            # bin over budget (oversized single docs get their own bin)
            over = bins.filter(
                (F.col("bin_tokens") > budget) & (F.size("doc_ids") > 1)
            )
            assert over.count() == 0
        packed.unpersist()
        bins.unpersist()

        # near-dup components → leakage-safe split
        cand = minhash_candidate_pairs(curated, "doc_id", "text")
        edges = jaccard_verify_pairs(
            curated, cand, "doc_id", "text", threshold=0.5
        ).select("id_a", "id_b")
        labels = min_id_components(
            curated.select(F.col("doc_id").alias("node")), edges
        )
        release = curated.join(
            labels.select(F.col("node").alias("doc_id"), "label"), "doc_id"
        )
        split_df = assign_split(
            release, {"train": 0.8, "val": 0.1, "test": 0.1}, group_col="label"
        )
        per_group = {
            r["label"]: (r["n"], r["n_splits"])
            for r in split_df.groupBy("label")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("split").alias("n_splits"),
            )
            .collect()
        }
        multi = [g for g, (n, _) in per_group.items() if n > 1]
        assert len(multi) >= 3, "planted near-dup components missing"
        assert all(per_group[g][1] == 1 for g in multi), "split leaked a group"

        # sharded release CARRYING THE ID ARRAYS (r11 — the loader-ready
        # artifact): two builds must agree manifest-for-manifest and
        # byte-for-byte (rebuild-identical training order)
        out = split_df.join(enc.select("doc_id", "input_ids"), "doc_id").select(
            "doc_id", "input_ids", "split"
        )
        m1 = write_training_shards(
            out, str(tmp_path / "rel1"), text_col="input_ids",
            n_shards=4, shuffle_seed="s1",
        )
        m2 = write_training_shards(
            out, str(tmp_path / "rel2"), text_col="input_ids",
            n_shards=4, shuffle_seed="s1",
        )
        assert m1 == m2
        assert m1["total_rows"] == n_curated

        def shard_hashes(p):
            out = {}
            for f in sorted(p.rglob("part-*")):
                rel = f.relative_to(p)
                out[str(rel.parent)] = hashlib.sha256(f.read_bytes()).hexdigest()
            return out

        h1 = shard_hashes(tmp_path / "rel1")
        h2 = shard_hashes(tmp_path / "rel2")
        assert h1 and list(h1.values()) == [h2[k] for k in h1]

        # read-back + decode: the shipped ids plus the shipped vocab
        # JSON reconstruct every document's normalized text exactly —
        # the artifact a training loader consumes is complete
        from waterdata_spark.sources.shards import read_training_shards

        back = read_training_shards(
            spark,
            str(tmp_path / "rel1"),
            schema="doc_id long, input_ids array<int>, split string",
        )
        originals = {r["doc_id"]: r["text"] for r in curated.collect()}
        got = back.collect()
        assert len(got) == n_curated
        for r in got:
            norm = " ".join(originals[r["doc_id"]].lower().split())
            assert decode_ids(r["input_ids"], vocab, "bpe") == norm
