"""Link-graph centrality for crawl curation (PageRank; Page et al.
1999 — public-domain algorithm). Web-scale corpus pipelines rank hosts
and pages by link centrality to prioritize crawling and as a quality
prior for selection; this is the batch operator for that stage,
built on the same iterate-checkpoint-converge machinery as the
connected-components operators (``dedup_approx.min_id_components``).

100 TB shape per iteration: ONE join of the (pre-partitioned, pinned)
edge list against the rank frame on ``src`` + one map-side-combinable
sum per ``dst`` — shuffle volume is O(E) doubles, never adjacency
lists. The edge list is repartitioned on ``src`` ONCE and
localCheckpointed, so every iteration's join reuses the same layout
instead of re-shuffling the graph. Each round runs exactly ONE driver
action: a single aggregate over the checkpointed rank frame yields
both the L1 convergence delta and the next round's dangling mass;
``max_iter`` is the diameter backstop, same contract as the CC loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup_approx import _release_checkpoint


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 40,
) -> DataFrame:
    """(node, rank) with Σ rank = 1. ``nodes`` has one column
    ``node``; ``edges`` has ``src``/``dst`` (directed; duplicate edges
    count once — standard simple-graph reading). Nodes with no
    out-links (dangling) redistribute their mass uniformly, the
    classic correction that keeps the distribution stochastic.

    rank_{t+1}(v) = (1-d)/N + d·( Σ_{u→v} rank_t(u)/outdeg(u)
                                  + dangling_mass_t/N )

    Edges whose ``src`` or ``dst`` is not in ``nodes`` are dropped
    BEFORE outdeg is computed (semi-join both endpoints). Links to
    pages outside the ranked set are the norm in crawl link graphs;
    counting them in outdeg while dropping their contribution would
    silently leak rank mass (Σ rank < 1). With the filter, a node
    whose only out-links leave the set is correctly dangling.
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(F.col("node"), F.lit(0.0).alias("rank"))
    node_keys = nodes.select("node")
    e = (
        edges.select("src", "dst")
        .distinct()
        .join(node_keys.select(F.col("node").alias("src")), "src", "left_semi")
        .join(node_keys.select(F.col("node").alias("dst")), "dst", "left_semi")
        .repartition(F.col("src"))
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    base = (
        nodes.select("node")
        .join(outdeg, "node", "left")
        .select("node", F.coalesce("__deg", F.lit(0)).alias("__deg"))
        .localCheckpoint(eager=True)
    )
    ranks = base.select(
        "node", "__deg", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=True)
    teleport = (1.0 - damping) / n_nodes
    # base's blocks are dead once the initial rank frame is
    # materialized — ranks is its own eager checkpoint
    _release_checkpoint(base)
    prev_ckpt = ranks  # the PRE-drop checkpointed frame of the last round
    # The initial dangling mass needs one bounded aggregate before the
    # loop; every LATER round's dangling mass is folded into the same
    # single action as the convergence delta (one job per iteration).
    dangling = (
        ranks.filter(F.col("__deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
    )
    for _ in range(max_iter):
        contrib = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"),
                    # dangling nodes never match the join (no src edges)
                    # but ANSI mode evaluates the projection first —
                    # guard the division
                    F.when(
                        F.col("__deg") > 0, F.col("rank") / F.col("__deg")
                    ).otherwise(F.lit(0.0)).alias("__share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__share").alias("__in"))
        )
        new_ranks = (
            ranks.select("node", "__deg", F.col("rank").alias("__old"))
            .join(contrib, "node", "left")
            .select(
                "node",
                "__deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce("__in", F.lit(0.0)) + F.lit(dangling / n_nodes))
                ).alias("rank"),
                "__old",
            )
            .localCheckpoint(eager=True)
        )
        # ONE action per round: the L1 convergence delta AND the next
        # round's dangling mass from the same checkpointed frame.
        stats = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("__old"))).alias("__delta"),
            F.sum(
                F.when(F.col("__deg") == 0, F.col("rank")).otherwise(F.lit(0.0))
            ).alias("__dangling"),
        ).first()
        delta = stats["__delta"]
        dangling = stats["__dangling"] or 0.0
        # release the PREVIOUS round's checkpoint — the frame that was
        # actually localCheckpointed (post-drop projections have no
        # LogicalRDD at the analyzed root, so releasing `ranks` would
        # silently no-op and pin every round's blocks; code-review r7)
        _release_checkpoint(prev_ckpt)
        prev_ckpt = new_ranks
        ranks = new_ranks.drop("__old")
        if delta is not None and delta < tol:
            break
    # the edge list is dead once the loop ends (the returned plan reads
    # only the final checkpointed rank frame)
    _release_checkpoint(e)
    return ranks.select("node", "rank")
