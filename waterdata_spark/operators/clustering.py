"""Distributed k-means over an embedding column (Lloyd 1982).

The missing trainer between the two existing consumers of centroids:
:func:`~waterdata_spark.operators.similarity.build_ivf_index` and
SemDeDup both fit centroids on a driver-local SAMPLE
(`similarity._lloyd_kmeans`) — the right call when a 40k sample
represents the corpus. When it doesn't (stratified corpora, heavy
mixture skew, k large enough that rare modes must seed their own
cells), the fit itself has to be distributed. This module runs
Lloyd's iterations where each pass over the data is:

1. **assignment** — nearest centroid by ROUNDED cosine (argmax of
   ``round(cos, round_dp)``, ties to the lowest centroid index): a
   zero-shuffle JVM scan (centroids ride the plan as literals below
   ``literal_max_elems``, an Arrow closure above — the SemDeDup
   assignment kernel, same determinism contract);
2. **update** — per-cluster mean of the raw member vectors, computed
   EXACTLY: every component rounds once to ``scale`` (1e6 → 6dp) and
   sums as an integer, so the sums are order-independent and the new
   centroid ``sum / (n * scale)`` is the same double bit-for-bit on
   any partitioning, any engine (the decimal_round recipe the BM25 /
   DSIR / NB oracles use). The per-iteration reduce is
   ``posexplode → groupBy(cluster, dim)`` — partial aggregation
   combines map-side, so the shuffle carries at most ``k*dim`` rows
   per task and the driver collects exactly ``k*dim`` rows.

Cosine assignment is scale-invariant, so the raw-mean update needs no
renormalization to affect assignment; empty clusters keep their
previous centroid (documented Lloyd convention).

100 TB shape: per iteration one full scan (narrow), one combiner-
friendly explode shuffle (n*dim rows in, <= k*dim per task out), one
bounded k*dim driver collect. No windows, no driver-side loops over
rows, centroid state is k*dim doubles. Integer sums are kept as
DECIMAL(38,0): at 1e12 members per cluster a BIGINT of 1e6-scaled
components would overflow.

Reference parity: no counterpart in the reference engine (its surface
is tabular prep — `down/down_water_prep.py`); X2/X3-family extension
surface. The x31 oracle row carries a ``km`` leg: two unrolled Lloyd
iterations from the frozen k=4 centroids, hash-checked against a
DuckDB twin that reproduces the scaled-integer sums and rounded-cosine
argmax value-for-value.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.operators.semdedup import _with_assignment
from waterdata_spark.operators.similarity import _unit_norms, with_unit_vector


@dataclass
class KMeansModel:
    centroids: np.ndarray  # (k, dim) float64 — raw means, NOT unit
    sizes: list[int]  # members per cluster at the final update
    n_iter: int

    def to_json(self) -> str:
        """Exact round-trip serialization (Python float repr is
        shortest-round-trip, so centroid bits survive) — the
        train-once / assign-everywhere split across sessions."""
        import json

        return json.dumps(
            {
                "centroids": [[float(x) for x in c] for c in self.centroids],
                "sizes": list(self.sizes),
                "n_iter": self.n_iter,
            }
        )

    @staticmethod
    def from_json(s: str) -> "KMeansModel":
        import json

        d = json.loads(s)
        return KMeansModel(
            centroids=np.asarray(d["centroids"], dtype="float64"),
            sizes=[int(x) for x in d["sizes"]],
            n_iter=int(d["n_iter"]),
        )


def _update_centroids(
    asg: DataFrame,
    vec_col: str,
    prev: np.ndarray,
    scale: int,
) -> tuple[np.ndarray, list[int]]:
    """One exact Lloyd update: scaled-integer component sums per
    (cluster, dim), collected as k*dim rows. Empty clusters keep
    their previous centroid."""
    k, dim = prev.shape
    stats = (
        asg.select(
            F.col("__cl"),
            F.posexplode(F.col(vec_col)).alias("__d", "__v"),
        )
        .groupBy("__cl", "__d")
        .agg(
            F.sum(
                F.round(F.col("__v").cast("double") * F.lit(float(scale)), 0).cast(
                    "decimal(38,0)"
                )
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    C = prev.copy()
    sizes = [0] * k
    by_cluster: dict[int, dict[int, int]] = {}
    for r in stats:
        by_cluster.setdefault(r["__cl"], {})[r["__d"]] = int(r["__s"])
        sizes[r["__cl"]] = int(r["__n"])
    for c, dims in by_cluster.items():
        n = sizes[c]
        for d in range(dim):
            C[c, d] = int(dims[d]) / (n * scale)
    return C, sizes


def _seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int, seed: int
) -> np.ndarray:
    """Deterministic init: the k rows with the smallest
    ``xxhash64(seed, id)`` — a TakeOrderedAndProject of k rows,
    stable under repartitioning and re-runs."""
    rows = (
        df.select(F.col(vec_col), F.xxhash64(F.lit(seed), F.col(id_col)).alias("__h"))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds the number of input vectors ({len(rows)})")
    return np.asarray([list(r[vec_col]) for r in rows], dtype="float64")


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | None = None,
    init_centroids: Sequence[Sequence[float]] | np.ndarray | None = None,
    n_iter: int = 8,
    seed: int = 7,
    round_dp: int = 6,
    scale: int = 10**6,
    literal_max_elems: int = 512,
    cluster_col: str = "cluster",
    cos_col: str = "cos_to_centroid",
) -> tuple[KMeansModel, DataFrame]:
    """Distributed Lloyd's k-means with the exact update contract
    described in the module docstring. Returns ``(model, assignments)``
    where assignments = df's (id_col,) + (cluster_col, cos_col) under
    the FINAL centroids.

    ``init_centroids`` freezes initialization (the oracle/differential
    form); otherwise ``k`` seeds deterministically by hash order. The
    input is scanned n_iter+1 times and deliberately NOT cached here:
    measured at 200k x 64-d, successive fits with an internal
    persist/unpersist cycle degraded 5 -> 16s (storage ping-pong in a
    long-lived JVM) while plain rescans held 4.4-6.2s — a parquet scan
    plus normalize is cheaper than cache churn. If ``df`` is an
    EXPENSIVE derivation (joins, UDFs), persist it upstream before
    calling; the returned assignment frame is lazy, so persist that
    too if you iterate it.

    ``literal_max_elems`` defaults LOWER than SemDeDup's assignment
    (512 vs 32k): the trainer evaluates the assignment expression
    n_iter+1 times, and at k*dim = 1024 the generated literal-dot code
    is big enough that JIT compilation goes unstable (measured at 200k
    x 64-d, k=16: literal path 24-50s per fit vs Arrow 11-14s). The
    Arrow closure is the steadier production path; the literal path
    stays for small k where it beats Arrow transport.
    """
    if init_centroids is None:
        if k is None:
            raise ValueError("pass k or init_centroids")
        C = _seed_centroids(df, id_col, vec_col, k, seed)
    else:
        C = np.asarray(init_centroids, dtype="float64")
        if k is not None and k != C.shape[0]:
            raise ValueError(f"k={k} disagrees with init_centroids rows {C.shape[0]}")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    base = df.select(F.col(id_col), F.col(vec_col))
    unit = with_unit_vector(base, vec_col)
    sizes: list[int] = []
    for _ in range(n_iter):
        asg = _with_assignment(
            unit, _unit_norms(C), round_dp, literal_max_elems, "__cl", "__cos"
        )
        C, sizes = _update_centroids(asg, vec_col, C, scale)
    final = _with_assignment(
        unit, _unit_norms(C), round_dp, literal_max_elems, cluster_col, cos_col
    ).select(id_col, cluster_col, cos_col)
    return KMeansModel(centroids=C, sizes=sizes, n_iter=n_iter), final


def kmeans_python(
    vectors: dict,
    init_centroids,
    n_iter: int,
    round_dp: int = 6,
    scale: int = 10**6,
) -> tuple[list[list[float]], dict]:
    """Pure-Python Lloyd twin of :func:`kmeans` — the differential
    oracle. Same rounded-cosine argmax (sequential double sums, ties
    to the lowest index), same half-away-from-zero component rounding,
    same exact integer sums, same ``s / (n * scale)`` division.
    ``vectors``: id -> sequence of floats. Returns (centroids,
    id -> cluster)."""
    import math

    def half_up(x: float) -> int:
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    def unit(v):
        s = 0.0
        for x in v:
            s = s + float(x) * float(x)
        n = math.sqrt(s)
        return [float(x) / n for x in v] if n else [0.0] * len(v)

    def assign(uv, C):
        best, best_s = 0, None
        for ci, c in enumerate(C):
            cu = unit(c)
            d = 0.0
            for a, b in zip(uv, cu):
                d = d + a * b
            # HALF_UP at round_dp like F.round / duckdb round, compared
            # as scaled ints (equivalent ordering to rounded doubles)
            s = half_up(d * 10**round_dp)
            if best_s is None or s > best_s:
                best, best_s = ci, s
        return best

    ids = sorted(vectors)
    units = {i: unit(vectors[i]) for i in ids}
    C = [[float(x) for x in c] for c in init_centroids]
    dim = len(C[0])
    lab: dict = {}
    for _ in range(n_iter):
        lab = {i: assign(units[i], C) for i in ids}
        sums: dict = {}
        counts: dict = {}
        for i in ids:
            c = lab[i]
            counts[c] = counts.get(c, 0) + 1
            acc = sums.setdefault(c, [0] * dim)
            for d, x in enumerate(vectors[i]):
                acc[d] += half_up(float(x) * scale)
        for c, acc in sums.items():
            n = counts[c]
            C[c] = [s / (n * scale) for s in acc]
    lab = {i: assign(units[i], C) for i in ids}
    return C, lab
