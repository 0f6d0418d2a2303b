"""A/B probe for min_id_components pointer doubling (VERDICT r12 item 4).

Compares the r12 propagate-only label-propagation loop (inlined below
as the baseline) against the r13 propagate+shortcut form on the REAL
oracle graphs:

  x25  linkage graph: levenshtein<=1 pairs over the planted part-key
       populations (the most expensive untouched oracle path in r12 —
       124s wall at sf0.01).
  x31  embedding graph: cosine_threshold_edges(embeddings, 0.4).

For each graph and each form: convergence ROUNDS (one Spark job +
localCheckpoint each — the driver-side latency VERDICT item 4 targets)
and WALL seconds, plus a label-map equality check (the two forms must
produce identical (node, label) output — the fixpoint is the same
operator fixpoint; doubling only reaches it in fewer rounds). Also
differentially checks 20 seeded random graphs.

Usage: python tools/cc_rounds_probe.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from waterdata_spark.operators.dedup_approx import (  # noqa: E402
    _release_checkpoint,
    min_id_components,
)
from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402


def baseline_min_id_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 50, stats: dict | None = None
) -> DataFrame:
    """The r12 form, verbatim minus the shortcut join: one neighbor-min
    propagation + changed-count action per round."""
    ckpt = nodes.select(F.col("node"), F.col("node").alias("label")).localCheckpoint(eager=True)
    labels = ckpt
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.id_a == labels.node)
            .groupBy(F.col("id_b").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_label = F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label")))
        prev_ckpt = ckpt
        ckpt = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                F.col("node"),
                new_label.alias("label"),
                (new_label < F.col("label")).cast("long").alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        _release_checkpoint(prev_ckpt)
        n_changed = ckpt.agg(F.sum("__changed")).first()[0]
        labels = ckpt.select("node", "label")
        if stats is not None:
            stats["rounds"] = stats.get("rounds", 0) + 1
        if not n_changed:
            break
    _release_checkpoint(sym)
    return labels


def _x25_graph(spark, sf_dir):
    from waterdata_spark.operators.linkage import link_pairs

    p = load_table(spark, sf_dir, "part")
    kbase = F.concat(F.col("p_name"), F.lit(" "), F.col("p_partkey").cast("string"))
    base = p.select(F.col("p_partkey").cast("long").alias("id"), kbase.alias("key"))
    typo = p.filter(F.col("p_partkey") % 7 == 0).select(
        (F.col("p_partkey") + 100000).cast("long").alias("id"),
        F.concat(
            F.substring(kbase, 1, 1), F.lit("x"), kbase.substr(F.lit(3), F.length(kbase))
        ).alias("key"),
    )
    cased = p.filter(F.col("p_partkey") % 11 == 0).select(
        (F.col("p_partkey") + 200000).cast("long").alias("id"),
        F.upper(F.regexp_replace(kbase, " ", "  ")).alias("key"),
    )
    df = base.unionByName(typo).unionByName(cased)
    pairs = link_pairs(
        df, None, "id", "key", max_distance=1,
        blocking=["prefix:4", "rprefix:4"], max_block_size=100,
    )
    nodes = df.select(F.col("id").alias("node"))
    edges = pairs.select("id_a", "id_b")
    return nodes, edges


def _x31_graph(spark, sf_dir):
    from waterdata_spark.operators.dedup_approx import cosine_threshold_edges

    e = load_table(spark, sf_dir, "embeddings")
    edges = cosine_threshold_edges(e, "vec_id", "embedding", threshold=0.4)
    return e.select(F.col("vec_id").alias("node")), edges


def _labels_map(df):
    return {r["node"]: r["label"] for r in df.collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("cc-rounds-probe")
    out: dict = {"sf_dir": sf_dir, "graphs": {}}

    for name, make in (("x25", _x25_graph), ("x31", _x31_graph)):
        nodes, edges = make(spark, sf_dir)
        # materialize the edge frame once so both forms time the CC
        # loop, not the candidate generation
        nodes = nodes.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        res = {}
        for form, fn in (("baseline", baseline_min_id_components), ("doubled", min_id_components)):
            stats: dict = {}
            t0 = time.time()
            lbl = fn(nodes, edges, stats=stats)
            got = _labels_map(lbl)
            wall = round(time.time() - t0, 2)
            res[form] = {"rounds": stats.get("rounds"), "wall_sec": wall}
            res.setdefault("_maps", []).append(got)
        res["equal"] = res["_maps"][0] == res["_maps"][1]
        del res["_maps"]
        out["graphs"][name] = res
        print(f"# {name}: {json.dumps(res)}", file=sys.stderr)
        _release_checkpoint(nodes)
        _release_checkpoint(edges)

    # differential sweep on seeded random graphs (shape coverage:
    # paths, stars, forests, dense blobs)
    import random

    mismatches = 0
    for seed in range(20):
        rng = random.Random(seed)
        n = rng.choice([10, 30, 60])
        m = rng.choice([0, n // 2, n, 3 * n])
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        erows = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)] or [(0, 0)]
        edges = spark.createDataFrame(erows, "id_a long, id_b long")
        a = _labels_map(baseline_min_id_components(nodes, edges))
        b = _labels_map(min_id_components(nodes, edges))
        if a != b:
            mismatches += 1
            print(f"# MISMATCH seed={seed}", file=sys.stderr)
    out["random_graphs"] = {"n": 20, "mismatches": mismatches}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
