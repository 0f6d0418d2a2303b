"""Hard-negative mining (operators/mining.py): planted geometry,
determinism, and exact==IVF equivalence at probe-all (the ANN
equivalence contract the similarity module uses)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.mining import mine_hard_negatives
from waterdata_spark.operators.similarity import build_ivf_index

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(spark):
    # anchor a=[1,0]; candidates chosen so every filter fires once:
    #   pos  [0.995, 0.0999] label 0 -> same label, excluded
    #   trap [1.0, 0.01]     label 1 -> sim ~0.99995 >= hi, excluded
    #                           (unlabeled-positive band exclusion)
    #   hard [0.9, 0.436]    label 1 -> sim ~0.90, kept (rank 1)
    #   mid  [0.5, 0.866]    label 1 -> sim ~0.50, kept (rank 2)
    #   far  [-1.0, 0.0]     label 2 -> sim -1, below lo, excluded
    #   self (id 100)        label 0 -> self, excluded
    data = spark.createDataFrame(
        [
            (1, [0.995, 0.0999], 0),
            (2, [1.0, 0.01], 1),
            (3, [0.9, 0.436], 1),
            (4, [0.5, 0.866], 1),
            (5, [-1.0, 0.0], 2),
            (100, [1.0, 0.0], 0),
        ],
        "vec_id int, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0], 0)], "qid int, embedding array<double>, label int"
    )
    return data, queries


class TestPlanted:
    def test_filters_and_order(self, planted):
        data, queries = planted
        out = mine_hard_negatives(
            data,
            queries,
            label_col="label",
            k=5,
            lo=0.2,
            hi=0.95,
        ).collect()
        assert [(r["neighbor_id"], r["rank"]) for r in out] == [(3, 1), (4, 2)]
        assert abs(out[0]["sim"] - 0.9) < 0.01
        assert abs(out[1]["sim"] - 0.5) < 0.01

    def test_k_truncates(self, planted):
        data, queries = planted
        out = mine_hard_negatives(
            data, queries, label_col="label", k=1, lo=0.2, hi=0.95
        ).collect()
        assert [(r["neighbor_id"], r["rank"]) for r in out] == [(3, 1)]

    def test_no_label_col_keeps_cross_and_same_label(self, planted):
        data, queries = planted
        out = mine_hard_negatives(data, queries, k=10, lo=0.2, hi=0.999).collect()
        # without label exclusion the same-label near-dup (id 1, sim
        # ~0.995) mines too; the band still drops the trap (sim
        # ~0.99995 >= hi) and self never appears
        got = {r["neighbor_id"] for r in out}
        assert 1 in got and 100 not in got and 2 not in got

    def test_bad_params(self, planted):
        data, queries = planted
        with pytest.raises(ValueError):
            mine_hard_negatives(data, queries, lo=0.9, hi=0.1)
        with pytest.raises(ValueError):
            mine_hard_negatives(data, queries, k=0)
        with pytest.raises(ValueError):
            mine_hard_negatives(data, queries, method="ivf")  # no index
        with pytest.raises(ValueError):
            mine_hard_negatives(data, queries, method="nope")

    def test_default_method_resolves_to_ivf_with_index(self, planted):
        # VERDICT r10 item 5: passing an index with no explicit method
        # must take the scale path, not the quadratic baseline — the
        # plan must contain no cross join (the exact path's signature)
        data, queries = planted
        idx = build_ivf_index(data, n_cells=2)
        out = mine_hard_negatives(
            data, queries, label_col="label", k=5, lo=0.2, hi=0.95,
            index=idx, n_probe=2, overfetch=50,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        got = [(r["neighbor_id"], r["rank"]) for r in out.collect()]
        assert got == [(3, 1), (4, 2)]

    def test_exact_refuses_beyond_row_bound(self, planted):
        # the quadratic baseline raises instead of silently cross-joining
        # a corpus-sized candidate side (VERDICT r10 item 5)
        data, queries = planted
        with pytest.raises(ValueError, match="max_exact_rows"):
            mine_hard_negatives(data, queries, k=1, max_exact_rows=3)
        # explicit opt-in: raising the bound runs the brute force
        out = mine_hard_negatives(
            data, queries, label_col="label", k=5, lo=0.2, hi=0.95,
            method="exact", max_exact_rows=10,
        ).collect()
        assert [(r["neighbor_id"], r["rank"]) for r in out] == [(3, 1), (4, 2)]


class TestIvfEquivalence:
    def test_exact_equals_ivf_at_probe_all(self, spark):
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        data = e.filter(F.col("vec_id") % 5 != 0)
        queries = (
            e.filter(F.col("vec_id") % 5 == 0)
            .select(
                F.col("vec_id").alias("qid"), "embedding", F.col("label")
            )
        )
        exact = mine_hard_negatives(
            data, queries, label_col="label", k=5, lo=0.1, hi=0.8
        )
        idx = build_ivf_index(data, n_cells=4)
        ivf = mine_hard_negatives(
            data,
            queries,
            label_col="label",
            k=5,
            lo=0.1,
            hi=0.8,
            method="ivf",
            index=idx,
            n_probe=4,  # probe-all: recall must be exact
            overfetch=50,  # cover band/label losses on this tiny corpus
        )
        a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
        b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in ivf.collect()}
        assert a == b and len(a) > 0

    def test_determinism_under_repartition(self, spark):
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        data = e.filter(F.col("vec_id") % 5 != 0)
        queries = e.filter(F.col("vec_id") % 5 == 0).select(
            F.col("vec_id").alias("qid"), "embedding", "label"
        )
        a = mine_hard_negatives(
            data, queries, label_col="label", k=3, lo=0.1, hi=0.8
        ).collect()
        b = mine_hard_negatives(
            data.repartition(7), queries.repartition(3), label_col="label",
            k=3, lo=0.1, hi=0.8,
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
