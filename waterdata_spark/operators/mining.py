"""Hard-negative mining for contrastive / retrieval training data.

Embedding and reranker training (DPR, Karpukhin et al. 2020; RocketQA,
Qu et al. 2021; SBERT's in-batch-negatives successors) needs, for each
anchor, the corpus items that LOOK like matches but aren't: the
highest-cosine neighbors that carry a different label, restricted to a
semi-hard band (too-similar candidates are likely unlabeled positives
— the false-negative trap RocketQA §4.1 denoises; too-dissimilar ones
are uninformative easy negatives). This module mines exactly that set
from an embedding column, as a first-class training-data operator.

Semantics (deterministic): for each query/anchor, rank candidates by
``round(cosine, round_dp)`` descending (``neighbor_id`` ascending on
ties), after dropping self-matches, same-label candidates, and
candidates outside ``[lo, hi)``; keep ``rank <= k``. Rounding before
the band/order comparison keeps every decision reproducible across
engines — the x16 'hardneg' oracle leg hash-checks the full output
against a DuckDB twin.

Scale shape: ``method="exact"`` is the quadratic verification baseline
(the x16 convention — brute force IS the oracle). ``method="ivf"`` is
the 100 TB path: search a prebuilt :class:`~waterdata_spark.operators.
similarity.IvfIndex` with ``k * overfetch`` candidates, join labels
back, then apply the same filter + rank — per-query cost is bounded by
the probed cells, never the corpus. Overfetch covers candidates lost
to the label/band filters; like any ANN path its recall is measured,
not assumed (tests pin exact == ivf at probe-all, the same equivalence
contract the retrieval module uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from waterdata_spark.operators.similarity import (
    IvfIndex,
    _dot,
    search_ivf_index,
    with_unit_vector,
)

__all__ = ["mine_hard_negatives"]


def mine_hard_negatives(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    label_col: str | None = None,
    query_label_col: str | None = None,
    k: int = 5,
    lo: float = 0.0,
    hi: float = 1.0,
    round_dp: int = 6,
    method: str | None = None,
    index: IvfIndex | None = None,
    n_probe: int = 4,
    overfetch: int = 4,
    max_broadcast_rows: int = 10_000_000,
    max_exact_rows: int = 1_000_000,
) -> DataFrame:
    """Mine up to ``k`` hard negatives per anchor.

    ``data``: candidate corpus with ``id_col``, ``vec_col`` and (if
    label exclusion is wanted) ``label_col``. ``queries``: anchors with
    ``query_id_col``, ``vec_col`` and ``query_label_col`` (defaults to
    ``label_col``). A candidate survives iff

    - ``neighbor_id != query_id`` (self never mines),
    - its label differs from the anchor's (when ``label_col`` is set —
      same-label candidates are presumed positives),
    - ``lo <= round(cosine, round_dp) < hi`` (the semi-hard band).

    Output: ``query_id, neighbor_id, sim, rank`` with rank 1..k by
    (sim desc, neighbor_id asc) — fully deterministic.

    ``method=None`` (default) resolves to the SCALE-SAFE choice
    (VERDICT r10): ``"ivf"`` when ``index`` is supplied, else
    ``"exact"``. The exact plan is a cross join — the documented
    quadratic oracle baseline, not a production path — so it refuses
    to run when the candidate side exceeds ``max_exact_rows``
    (one bounded count; raise the bound explicitly to opt into a
    bigger brute force, e.g. a verification probe).

    ``method="ivf"`` requires ``index`` (built by
    :func:`~waterdata_spark.operators.similarity.build_ivf_index` over
    the same data side) and fetches ``k * overfetch`` pre-filter
    candidates per anchor; raise ``overfetch`` when labels are few or
    the band is narrow (many candidates filter away).
    """
    if not lo <= hi:
        raise ValueError(f"need lo <= hi, got {lo=} {hi=}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k=}")
    if method is None:
        method = "ivf" if index is not None else "exact"
    qlabel = query_label_col or label_col

    if method == "exact":
        n_data = data.count()
        if n_data > max_exact_rows:
            raise ValueError(
                f"method='exact' is the quadratic verification baseline and the "
                f"candidate corpus has {n_data} rows > max_exact_rows="
                f"{max_exact_rows}; build an IvfIndex and pass method='ivf' "
                f"(or raise max_exact_rows to opt in explicitly)"
            )
        d_cols = [F.col(id_col).alias("neighbor_id"), F.col("__unit").alias("__ub")]
        if label_col:
            d_cols.append(F.col(label_col).alias("__dlab"))
        d = with_unit_vector(
            data.select(id_col, vec_col, *([label_col] if label_col else [])), vec_col
        ).select(*d_cols)
        q_cols = [F.col(query_id_col).alias("query_id"), F.col("__unit").alias("__ua")]
        if qlabel:
            q_cols.append(F.col(qlabel).alias("__qlab"))
        q = with_unit_vector(
            queries.select(query_id_col, vec_col, *([qlabel] if qlabel else [])),
            vec_col,
        ).select(*q_cols)
        cand = q.crossJoin(d).withColumn(
            "sim", F.round(_dot(F.col("__ua"), F.col("__ub")), round_dp)
        )
    elif method == "ivf":
        if index is None:
            raise ValueError("method='ivf' requires a prebuilt index")
        hits = search_ivf_index(
            index,
            queries.select(query_id_col, vec_col),
            vec_col=vec_col,
            query_id_col=query_id_col,
            k=k * overfetch,
            n_probe=n_probe,
            sim_col="__rawsim",
            # RAW similarity: the search's own 6dp rounding composed with
            # round_dp would double-round, flipping band/rank membership
            # at boundaries for round_dp != 6 and breaking the documented
            # exact == ivf equivalence (ADVICE r10) — round exactly once
            sim_round_dp=None,
        ).select("query_id", "neighbor_id", F.round("__rawsim", round_dp).alias("sim"))
        cand = hits
        if label_col:
            # counted-and-bounded broadcast with shuffle fallback (the
            # repo convention): the label map is 2 narrow columns
            dlab = data.select(
                F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__dlab")
            )
            if dlab.count() <= max_broadcast_rows:
                dlab = F.broadcast(dlab)
            qlab = queries.select(
                F.col(query_id_col).alias("query_id"), F.col(qlabel).alias("__qlab")
            )
            cand = cand.join(dlab, "neighbor_id").join(qlab, "query_id")
    else:
        raise ValueError(f"unknown method {method!r}")

    cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    if label_col:
        cand = cand.filter(F.col("__dlab") != F.col("__qlab"))
    cand = cand.filter(
        (F.col("sim") >= F.lit(float(lo))) & (F.col("sim") < F.lit(float(hi)))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
