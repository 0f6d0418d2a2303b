"""Plan-shape regression tests (SURVEY.md §4): pin the physical plans
we audited — pushdown reaches scans, dims broadcast, the fallback
join scans the fact exactly once, no sort-merge joins sneak in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from waterdata_spark.plans.explain import assert_plan, plan_summary
from waterdata_spark.queries import QUERIES


def test_filter_pushdown_q02(spark):
    df = QUERIES["q02_filter_project"].fn(spark, SF_ORACLE)
    s = assert_plan(df, require_pushed=["l_shipdate", "l_discount", "l_quantity"])
    # projection pruned to exactly the needed columns
    assert any("l_orderkey" in rs and "l_tax" not in rs for rs in s.read_schemas)


def test_broadcast_joins_q03(spark):
    df = QUERIES["q03_revenue_by_nation"].fn(spark, SF_ORACLE)
    assert_plan(df, min_broadcast_joins=2, max_sort_merge_joins=0, max_exchanges=1)


def test_fallback_join_scans_fact_once(spark):
    """The single-pass rewrite's contract: one fact scan, broadcast-only
    joins, no shuffle of the fact."""
    df = QUERIES["q14_fallback_join"].fn(spark, SF_ORACLE)
    assert_plan(
        df,
        min_broadcast_joins=2,
        max_sort_merge_joins=0,
        max_scans_of={"events.parquet": 1},
    )


def test_priority_dedup_single_shuffle(spark):
    """q06 runs the pruned WINDOW form since r6 (the min_by aggregate
    spills on high-cardinality keys once its payload actually
    materializes — honest-drain finding, SCALING.md): pin one shuffle,
    a Window node, and the payload pruned to the 3 output columns at
    the scan (the unpruned 16-column payload cost 56s vs 7.4s at
    sf10)."""
    df = QUERIES["q06_priority_dedup"].fn(spark, SF_ORACLE)
    s = assert_plan(df, max_exchanges=1)
    assert "Window" in s.text and "row_number" in s.text
    assert "min_by" not in s.text
    assert any(
        "l_extendedprice" in rs and "l_shipdate" not in rs and "l_comment" not in rs
        for rs in s.read_schemas
    )


def test_asof_fused_tie_dedup_single_shuffle(spark):
    """q18 (r12, VERDICT r11 item 8): the clicks tie-dedup is fused
    into the as-of window via right_order — pin ONE exchange and ONE
    Window over the union (the pre-fusion plan carried 2 exchanges and
    a second window for priority_dedup; plan counts measured 1/1/1 vs
    2/3/4 exchange/sort/window)."""
    df = QUERIES["q18_asof_join"].fn(spark, SF_ORACLE)
    s = assert_plan(df, max_exchanges=1)
    # the formatted plan prints each node twice (tree + detail), so one
    # physical Window == two textual mentions
    assert s.text.count("Window") == 2
    assert "row_number" not in s.text  # no separate dedup window


def test_pricing_summary_partial_agg(spark):
    df = QUERIES["q01_pricing_summary"].fn(spark, SF_ORACLE)
    s = assert_plan(df, max_exchanges=1)
    assert s.text.count("HashAggregate") >= 2  # partial + final


def test_shingle_let_binding_holds_x08(spark):
    """r12 change 1 (ADVICE r12): sliding_windows let-binds its base
    array as element_at(transform(array(arr), ...), 1) so the
    char-shingle base expression `split(text, '')` evaluates ONCE per
    row — Catalyst has no cross-operand CSE, and the inlined form
    re-evaluated it ~15x in the x08 MinHash plan. The binding relies
    on the optimizer NOT simplifying that wrapper back into an inlined
    lambda; pin it so a Spark upgrade regression is caught here, not
    by a bench decade."""
    df = QUERIES["x08_minhash_bands"].fn(spark, SF_ORACLE)
    assert plan_summary(df).text.count("split(text") == 1


class TestSaltedJoin:
    def test_matches_unsalted(self, spark):
        from waterdata_spark.operators.skew import salted_join

        skewed = spark.createDataFrame(
            [(1, i) for i in range(500)] + [(2, 0), (3, 1)], "k long, v long"
        )
        dim = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b"), (4, "unused")], "k long, p string")
        plain = skewed.join(dim, "k").select("k", "v", "p")
        salted = salted_join(skewed, dim, on=["k"], n_salts=4).select("k", "v", "p")
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_join_semantics(self, spark):
        from waterdata_spark.operators.skew import salted_join

        skewed = spark.createDataFrame([(1, 1), (9, 2)], "k long, v long")
        dim = spark.createDataFrame([(1, "x")], "k long, p string")
        out = salted_join(skewed, dim, on=["k"], n_salts=3, how="left")
        rows = {r["k"]: r["p"] for r in out.collect()}
        assert rows == {1: "x", 9: None}


class TestRangeJoinPlan:
    def test_no_nested_loop(self, spark):
        """The bucketized range join must plan as a broadcast HASH join,
        not BroadcastNestedLoopJoin."""
        from waterdata_spark.queries import QUERIES

        df = QUERIES["q27_range_join"].fn(spark, SF_ORACLE)
        s = plan_summary(df)
        assert "BroadcastNestedLoopJoin" not in s.text
        assert s.n_broadcast_joins >= 1


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Two tables bucketed on the join key must join with ZERO
        Exchange operators (the 100 TB fact-join win)."""
        from waterdata_spark.schemas import load_table
        from waterdata_spark.sources.bucketed import read_table, write_bucketed

        spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
        try:
            li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
            o = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_totalprice")
            write_bucketed(li, "bktest.li_b", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
            write_bucketed(o, "bktest.o_b", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
            a = read_table(spark, "bktest.li_b")
            b = read_table(spark, "bktest.o_b")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = a.join(b, a.l_orderkey == b.o_orderkey)
                s = plan_summary(j)
                assert s.n_exchanges == 0, s.text
                assert j.count() > 0
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        finally:
            spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


class TestExpectationPlans:
    def test_multi_range_gate_single_scan(self, spark):
        """expect_ranges evaluates every gate in ONE aggregate over ONE
        scan (the module doctrine: no per-gate re-scan at 100 TB)."""
        from waterdata_spark.operators.expectations import _range_violation
        from waterdata_spark.schemas import load_table

        li = load_table(spark, SF_ORACLE, "lineitem")
        agg = li.agg(
            _range_violation("l_quantity", 0, 100, True),
            _range_violation("l_discount", 0, 1, True),
        )
        s = plan_summary(agg)
        assert s.n_scans == 1, s.text
        # the scan reads only the gated columns, not the whole table
        assert any(
            "l_quantity" in rs and "l_comment" not in rs for rs in s.read_schemas
        ), s.read_schemas

    def test_profile_single_scan_exact_and_approx(self, spark):
        from waterdata_spark.operators.expectations import profile
        from waterdata_spark.schemas import load_table

        cust = load_table(spark, SF_ORACLE, "customer")
        exact = profile(cust, ["c_nationkey", "c_mktsegment"])
        approx = profile(cust, ["c_nationkey", "c_mktsegment"], approx=True)
        e = {r["column"]: r for r in exact.collect()}
        a = {r["column"]: r for r in approx.collect()}
        # HLL++ at default rsd=5%: allow small absolute slack
        assert e["c_nationkey"]["n_distinct"] == 25
        assert e["c_mktsegment"]["n_distinct"] == 5
        assert abs(a["c_nationkey"]["n_distinct"] - 25) <= 2
        assert abs(a["c_mktsegment"]["n_distinct"] - 5) <= 1
        # approx plan must not contain the multi-distinct Expand
        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cust.agg(
                F.approx_count_distinct("c_nationkey"),
                F.approx_count_distinct("c_mktsegment"),
            ).explain("formatted")
        assert "Expand" not in buf.getvalue()


class TestIvfIndexPlan:
    def test_no_full_table_sort_and_no_centroid_literals(self, spark):
        """The IVF index must not sort the full table to pick centroids
        (old seeded path planned a TakeOrderedAndProject) and must not
        inline centroid vectors as plan literals — they ride the
        assignment UDF's closure."""
        from waterdata_spark.operators.similarity import cosine_topk_ivf
        from waterdata_spark.schemas import load_table

        emb = load_table(spark, SF_ORACLE, "embeddings")
        out = cosine_topk_ivf(emb, k=3, n_cells=4, n_probe=2)
        s = plan_summary(out)
        assert "TakeOrderedAndProject" not in s.text
        # global sort would plan an Exchange rangepartitioning
        assert "rangepartitioning" not in s.text
        # sanity: it still produces ranked neighbors
        assert out.filter(F.col("rank") == 1).count() > 0

    def test_index_build_runs_at_most_three_jobs(self, spark):
        """The IVF index build (everything eager before the first
        downstream action) must be: one metadata-fast count, one
        combined sample count+dim aggregate, one bounded sample
        collect. The old form ran three separate count jobs plus the
        dim probe (VERDICT r3, task 6)."""
        from waterdata_spark.operators.similarity import cosine_topk_ivf_blocked
        from waterdata_spark.schemas import load_table

        emb = load_table(spark, SF_ORACLE, "embeddings")
        sc = spark.sparkContext
        sc.setJobGroup("ivf-build-count", "IVF index build job audit")
        try:
            cosine_topk_ivf_blocked(emb, k=3, n_cells="auto", n_probe=2)  # build only, no action
        finally:
            sc.setJobGroup("ivf-build-done", "")
        jobs = sc.statusTracker().getJobIdsForGroup("ivf-build-count")
        assert len(jobs) <= 3, f"index build ran {len(jobs)} jobs: {jobs}"

    def test_kmeans_matches_seeded_shape_and_is_deterministic(self, spark):
        from waterdata_spark.operators.similarity import cosine_topk_ivf_blocked
        from waterdata_spark.schemas import load_table

        emb = load_table(spark, SF_ORACLE, "embeddings")
        a = cosine_topk_ivf_blocked(emb, k=3, n_cells=8, n_probe=3).collect()
        b = cosine_topk_ivf_blocked(emb, k=3, n_cells=8, n_probe=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestPartitionPruning:
    def test_partitioned_write_prunes_on_read(self, spark, tmp_path):
        """partitionBy gives the optimizer real partition pruning: a
        predicate on the partition column must land in PartitionFilters
        and cut the scanned partition count to 1 — the 100 TB contract
        behind per-year/per-source directory layouts."""
        from waterdata_spark.schemas import load_table
        from waterdata_spark.sources.sink import write_parquet

        ev = load_table(spark, SF_ORACLE, "events")
        path = str(tmp_path / "events_by_type")
        write_parquet(ev, path, partition_by=["event_type"])
        n_types = ev.select("event_type").distinct().count()

        back = spark.read.parquet(path).filter(F.col("event_type") == "click")
        s = plan_summary(back)
        assert "PartitionFilters" in s.text and "event_type" in s.text
        # collect() THIS DataFrame: count()/select() build separate
        # query executions whose metrics wouldn't be back's
        rows = back.collect()
        assert len(rows) == ev.filter(F.col("event_type") == "click").count()
        # the executed scan's metrics are the ground truth: exactly ONE
        # of the N type-partitions was read
        leaf = back._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        assert n_types > 1
        assert leaf.metrics().apply("numPartitions").value() == 1
        assert leaf.metrics().apply("numFiles").value() == 1


class TestDecontaminatePlan:
    def test_gram_join_broadcasts_and_corpus_scans_once(self, spark):
        """The contamination flag pass must broadcast the (small) eval
        gram set — never sort-merge the corpus grams — and the corpus
        parquet is scanned once per pass (flag + anti-join = 2 total
        for decontaminate)."""
        from waterdata_spark.operators.decontaminate import ngram_contamination
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
        ev = docs.limit(20).select(
            F.col("doc_id").alias("eid"),
            F.col("text").alias("etext"),
        )
        out = ngram_contamination(docs, ev, n=13, eval_id_col="eid", eval_text_col="etext")
        assert_plan(
            out,
            min_broadcast_joins=1,
            max_sort_merge_joins=0,
            max_scans_of={"documents.parquet": 2},  # corpus + eval derive from it here
        )


class TestCacheHygiene:
    """Long-lived-JVM storage discipline (round 4): operator-internal
    persisted frames must not accumulate across invocations. Measured
    cost of getting this wrong: six stale IVF checkpoints inflated an
    unrelated sf10 aggregation 2.4x in the same JVM."""

    @staticmethod
    def _n_stored(spark) -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    def _settled(self, spark, at_most: int, tries: int = 20) -> int:
        """Async unpersist: poll until the block count settles."""
        import time

        n = self._n_stored(spark)
        for _ in range(tries):
            if n <= at_most:
                break
            time.sleep(0.25)
            n = self._n_stored(spark)
        return n

    @pytest.fixture()
    def emb(self, spark):
        import random

        r = random.Random(7)
        rows = [(i, [r.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_repeated_ivf_builds_hold_one_generation(self, spark, emb):
        from waterdata_spark.operators.similarity import cosine_topk_ivf_blocked
        from waterdata_spark.plans import cachereg

        cachereg.release_all()
        base = self._settled(spark, 0)
        for _ in range(3):
            cosine_topk_ivf_blocked(emb, k=3, n_cells=4, n_probe=2).count()
        # generation semantics: 3 builds, at most ONE live index persist
        assert self._settled(spark, base + 1) <= base + 1
        cachereg.release_all()
        assert self._settled(spark, base) <= base

    def test_query_boundary_drains_previous_query_caches(self, spark):
        from waterdata_spark.plans import cachereg

        cachereg.release_all()
        base = self._settled(spark, 0)
        QUERIES["x16_ann_search"].fn(spark, SF_ORACLE).count()  # registers its persist
        QUERIES["q22_orderby_limit"].fn(spark, SF_ORACLE).count()  # entry drain releases it
        assert self._settled(spark, base) <= base

    def test_cc_loop_leaves_only_final_labels(self, spark):
        """A 6-node path graph needs several propagation rounds; every
        intermediate round snapshot and the edge snapshot must be freed
        by loop end — only the final labels checkpoint may remain."""
        from waterdata_spark.operators.dedup_approx import min_id_components
        from waterdata_spark.plans import cachereg

        cachereg.release_all()
        base = self._settled(spark, 0)
        nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
        edges = spark.createDataFrame([(i, i + 1) for i in range(5)], "id_a long, id_b long")
        labels = min_id_components(nodes, edges)
        got = {(r["node"], r["label"]) for r in labels.collect()}
        assert got == {(i, 0) for i in range(6)}
        assert self._settled(spark, base + 1) <= base + 1


class TestGeometryPlans:
    """r8 geometry trainers: pin the plan shapes that make them scale —
    the k-means update combines map-side and shuffles only k*dim keyed
    partials; PCA projection stays JVM-only (no Python in the scan)."""

    def test_kmeans_update_partial_agg_no_python(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            _with_assignment,
        )
        from waterdata_spark.operators.similarity import (
            _unit_norms,
            with_unit_vector,
        )
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_ORACLE, "embeddings")
        unit = with_unit_vector(e.select("vec_id", "embedding"), "embedding")
        asg = _with_assignment(
            unit,
            _unit_norms(np.asarray(FROZEN_CENTROIDS_64D_K4)),
            6,
            32_768,
            "__cl",
            "__cos",
        )
        stats = (
            asg.select("__cl", F.posexplode("embedding").alias("__d", "__v"))
            .groupBy("__cl", "__d")
            .agg(
                F.sum(
                    F.round(F.col("__v").cast("double") * F.lit(1e6), 0).cast(
                        "decimal(38,0)"
                    )
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        s = assert_plan(stats, max_exchanges=1)
        # map-side combine before the k*dim exchange
        assert s.text.count("HashAggregate") >= 2
        # assignment + reduce all JVM: no Python evaluation anywhere
        assert "BatchEvalPython" not in s.text and "ArrowEvalPython" not in s.text

    def test_pca_projection_zero_shuffle_jvm_only(self, spark):
        from waterdata_spark.operators.embeddings import fit_pca, project_pca
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_ORACLE, "embeddings").limit(50)
        m = fit_pca(e, "embedding", 4)
        out = project_pca(e, "embedding", m, whiten=True)
        s = assert_plan(out, max_exchanges=0)
        assert "BatchEvalPython" not in s.text and "ArrowEvalPython" not in s.text
