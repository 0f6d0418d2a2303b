"""Embedding-space transforms: exact distributed PCA fit + whitening.

Public technique: PCA whitening of sentence/document embeddings —
Su et al. 2021, "Whitening Sentence Representations for Better
Semantics and Faster Retrieval" (arXiv:2103.15316): center, rotate to
the covariance eigenbasis, optionally scale each axis by 1/sqrt(λ).
In a training-data pipeline it sits between the embedder and the
geometric consumers (ANN search, SemDeDup, k-means): whitened spaces
make cosine thresholds comparable across corpora and concentrate
variance in the leading axes, so a truncated projection (n_components
< dim) is also the standard cheap dimensionality reduction before
LSH/IVF.

Two fit paths, one projection:

* **Exact integer path** (``method='exact'``, the oracle /
  differential contract — the repo-wide decimal_round recipe): the
  fit reduces the corpus to FIRST and SECOND moment sums computed on
  1e6-scaled integers — every component rounds ONCE, factors are cast
  to DECIMAL(19,0) before the product (a long*long product wraps
  silently in non-ANSI mode above |v|~3e3, ADVICE r8), sums ride
  DECIMAL(38,0) — so the moment matrix is order-independent and
  bit-equal on any partitioning (test-pinned). The double-posexplode
  second-moment pass multiplies rows by d(d+1)/2 BEFORE the map-side
  combine — fine at d≤~128, impractical at the d=768 real embedding
  models emit (~295k exploded rows per document; VERDICT r8 named
  this the repo's one scale cliff).
* **Arrow partial-Gram path** (``method='gram'``, the PRODUCTION fit,
  r9): one ``mapInPandas`` pass accumulates a per-partition float64
  Gram matrix (``X.T @ X``, one d x d numpy matrix per partition) and
  component sums; the driver sums P partition rows. Cost per row is
  O(d²) FLOPs with no row multiplication — ~d x cheaper than the
  exact path and the only practical fit at production dims (probed at
  d=512 x 200k rows, tools/pca_scale_probe.py). Float64 summation is
  order-DEPENDENT across partitions, so the result is approximate
  (~1e-9 relative vs exact; tolerance-tested at 1e-6 on
  eigenvectors) and not bit-stable under repartitioning — use
  ``'exact'`` when the differential/oracle contract matters, 'gram'
  everywhere else.

``method='auto'`` (the default) routes by dimension: exact at
d ≤ 128, gram above. The eigendecomposition of the d x d matrix is
driver-side `numpy.linalg.eigh` (symmetric, LAPACK) with a
deterministic sign convention (largest-|component| positive) on both
paths. The pure-Python differential recomputes the integer moments
and must match the exact path EXACTLY; eigh then agrees because its
input bits agree.

100 TB shape: both fits are combiner-friendly single-pass reduces
(exact: two JVM aggregations; gram: one Arrow scan emitting P rows of
d(d+3)/2+1 doubles). Driver state is one d x d matrix. Projection is
a narrow zero-shuffle JVM scan: out[j] = dot(v, W_j) - b_j with W as
plan literals — no UDF, whole-stage codegen.

Reference parity: no counterpart in the reference engine; X3-family
extension surface (SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,) float64
    components: np.ndarray  # (r, d) float64 — rows are principal axes
    eigenvalues: np.ndarray  # (r,) float64, descending
    n: int
    scale: int

    def to_json(self) -> str:
        """Exact round-trip serialization (shortest-round-trip float
        repr) — fit once, project in any later session."""
        import json

        return json.dumps(
            {
                "mean": [float(x) for x in self.mean],
                "components": [[float(x) for x in r] for r in self.components],
                "eigenvalues": [float(x) for x in self.eigenvalues],
                "n": self.n,
                "scale": self.scale,
            }
        )

    @staticmethod
    def from_json(s: str) -> "PCAModel":
        import json

        d = json.loads(s)
        return PCAModel(
            mean=np.asarray(d["mean"], dtype="float64"),
            components=np.asarray(d["components"], dtype="float64"),
            eigenvalues=np.asarray(d["eigenvalues"], dtype="float64"),
            n=int(d["n"]),
            scale=int(d["scale"]),
        )


def _scaled_long(c: Column, scale: int) -> Column:
    return F.round(c.cast("double") * F.lit(float(scale)), 0).cast("long")


#: ``method='auto'`` switches from the exact integer fit to the Arrow
#: partial-Gram fit above this dimension (the exact path's exploded-row
#: multiplier d(d+1)/2 passes ~8k here — still fine locally, far past
#: it at d=768).
AUTO_EXACT_MAX_DIM = 128


def fit_pca(
    df: DataFrame,
    vec_col: str,
    n_components: int,
    scale: int = 10**6,
    method: str = "auto",
) -> PCAModel:
    """PCA fit — see the module docstring for the two paths.
    Centering is part of the model (the mean rides into the projection
    offset); covariance uses the population convention (divide by n)
    like the differential. ``method``: 'exact' | 'gram' | 'auto'
    (exact at d ≤ 128, gram above — production embedding dims route to
    the Arrow fit automatically)."""
    if method not in ("auto", "exact", "gram"):
        raise ValueError(f"method must be 'auto', 'exact' or 'gram', got {method!r}")
    if method == "auto":
        probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is None:
            raise ValueError("fit_pca: empty input")
        method = "exact" if int(probe["d"]) <= AUTO_EXACT_MAX_DIM else "gram"
    if method == "gram":
        return fit_pca_gram(df, vec_col, n_components)
    first = (
        df.select(F.posexplode(F.col(vec_col)).alias("__i", "__v"))
        .groupBy("__i")
        .agg(
            F.sum(_scaled_long(F.col("__v"), scale).cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if not first:
        raise ValueError("fit_pca: empty input")
    d = len(first)
    ns = {int(r["n"]) for r in first}
    if len(ns) != 1:
        raise ValueError(
            f"fit_pca: ragged vectors — per-dimension counts differ ({sorted(ns)})"
        )
    n = ns.pop()
    if not (1 <= n_components <= d):
        raise ValueError(f"n_components must be in [1, {d}]")
    s1 = np.zeros(d, dtype=object)
    for r in first:
        s1[r["__i"]] = int(r["s"])

    ex = df.select(
        F.posexplode(F.col(vec_col)).alias("__i", "__vi"),
        F.col(vec_col).alias("__w"),
    )
    # The factors are cast to decimal BEFORE the multiply: a long*long
    # product silently wraps in non-ANSI mode once |component|*scale
    # exceeds ~3e9 (|v| ~ 3e3 at the default 1e6 scale), corrupting
    # the covariance with no error (ADVICE r8). decimal(19,0) *
    # decimal(19,0) promotes to decimal(38,0) — exact for any pair of
    # long-ranged factors.
    second = (
        ex.select(
            "__i",
            _scaled_long(F.col("__vi"), scale).cast("decimal(19,0)").alias("__si"),
            F.posexplode("__w").alias("__j", "__vj"),
        )
        .filter(F.col("__j") >= F.col("__i"))
        .groupBy("__i", "__j")
        .agg(
            F.sum(
                F.col("__si")
                * _scaled_long(F.col("__vj"), scale).cast("decimal(19,0)")
            ).alias("s2")
        )
        .collect()
    )
    S2 = np.zeros((d, d), dtype=object)
    for r in second:
        S2[r["__i"], r["__j"]] = int(r["s2"])
        S2[r["__j"], r["__i"]] = int(r["s2"])

    return _model_from_moments(s1, S2, n, d, n_components, scale)


def fit_pca_gram(
    df: DataFrame,
    vec_col: str,
    n_components: int,
) -> PCAModel:
    """Arrow partial-Gram PCA fit — the PRODUCTION path at real
    embedding dims (module docstring; VERDICT r8 item 1).

    One ``mapInPandas`` scan: each partition accumulates
    ``n`` (rows), ``s = Σx`` (d doubles) and the Gram matrix
    ``G = Σ x xᵀ`` (upper triangle, d(d+1)/2 doubles) in float64
    numpy, emitting ONE row per partition. The driver sums the P
    partition rows and finishes exactly like the exact path:
    cov = G/n − mean meanᵀ → eigh → sign-fixed top-r model. No
    shuffle, no exploded rows — per-row cost is one rank-1 BLAS
    update (O(d²) FLOPs), ~d× cheaper than the exact path's
    d(d+1)/2-row explode.

    Float64 partial sums are order-dependent across partitions:
    the result is ~1e-9-relative-close to the exact fit (tolerance-
    tested) but NOT bit-stable under repartitioning. ``scale`` is
    recorded as 0 in the model to mark the float fit."""
    import pandas as pd

    if not isinstance(n_components, int) or n_components < 1:
        raise ValueError("n_components must be a positive int")

    out_schema = "n long, d int, s array<double>, g array<double>"

    def partial_gram(batches):
        n = 0
        s = None
        G = None
        d = None
        for pdf in batches:
            col = pdf.iloc[:, 0]
            if len(col) == 0:
                continue
            X = np.vstack(col.to_numpy())
            if d is None:
                d = X.shape[1]
                s = np.zeros(d, dtype="float64")
                G = np.zeros((d, d), dtype="float64")
            elif X.shape[1] != d:
                raise ValueError(
                    f"fit_pca_gram: ragged vectors (saw dims {d} and {X.shape[1]})"
                )
            n += X.shape[0]
            s += X.sum(axis=0)
            G += X.T @ X
        if n == 0:
            return
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {"n": [n], "d": [d], "s": [s.tolist()], "g": [G[iu].tolist()]}
        )

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(partial_gram, out_schema)
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca_gram: empty input")
    dims = {int(r["d"]) for r in rows}
    if len(dims) != 1:
        raise ValueError(f"fit_pca_gram: ragged vectors across partitions ({sorted(dims)})")
    d = dims.pop()
    if n_components > d:
        raise ValueError(f"n_components must be in [1, {d}]")
    n = sum(int(r["n"]) for r in rows)
    s = np.zeros(d, dtype="float64")
    Gu = np.zeros(d * (d + 1) // 2, dtype="float64")
    for r in rows:
        s += np.asarray(r["s"], dtype="float64")
        Gu += np.asarray(r["g"], dtype="float64")
    G = np.zeros((d, d), dtype="float64")
    iu = np.triu_indices(d)
    G[iu] = Gu
    G.T[iu] = Gu
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    return _model_from_cov(mean, cov, n, n_components, scale=0)


def _model_from_moments(
    s1: np.ndarray, S2: np.ndarray, n: int, d: int, n_components: int, scale: int
) -> PCAModel:
    """Shared with the pure-Python differential: moments (exact ints)
    -> float64 covariance -> eigh -> sign-fixed top-r model."""
    mean = np.array([int(v) / (n * scale) for v in s1], dtype="float64")
    cov = np.empty((d, d), dtype="float64")
    for i in range(d):
        for j in range(d):
            # E[xy] - E[x]E[y], each term from exact integer sums
            cov[i, j] = int(S2[i, j]) / (n * scale * scale) - mean[i] * mean[j]
    return _model_from_cov(mean, cov, n, n_components, scale)


def _model_from_cov(
    mean: np.ndarray, cov: np.ndarray, n: int, n_components: int, scale: int
) -> PCAModel:
    """Shared tail of every fit path: eigh (symmetric, LAPACK,
    ascending) -> top-r descending -> deterministic sign convention
    (largest-|component| entry positive)."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T.copy()  # (r, d)
    for k in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[k]))
        if comps[k, m] < 0:
            comps[k] = -comps[k]
    return PCAModel(
        mean=mean,
        components=comps,
        eigenvalues=vals[order].copy(),
        n=n,
        scale=scale,
    )


def fit_pca_python(
    vectors: list, n_components: int, scale: int = 10**6
) -> PCAModel:
    """Pure-Python differential twin of :func:`fit_pca`: identical
    HALF_UP scaling, identical exact integer moment sums, identical
    driver-side decomposition."""
    import math

    def half_up(x: float) -> int:
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    n = len(vectors)
    d = len(vectors[0])
    s1 = np.zeros(d, dtype=object)
    S2 = np.zeros((d, d), dtype=object)
    for v in vectors:
        sv = [half_up(float(x) * scale) for x in v]
        for i in range(d):
            s1[i] += sv[i]
            for j in range(i, d):
                p = sv[i] * sv[j]
                S2[i, j] += p
                if i != j:
                    S2[j, i] += p
    return _model_from_moments(s1, S2, n, d, n_components, scale)


def project_pca(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Adds ``out_col: array<double>`` = components @ (v - mean),
    optionally scaled by 1/sqrt(eigenvalue) (whitening; axes with
    eigenvalue <= eps are zeroed, not exploded). Zero shuffle — each
    output element is one literal-array dot; the centering offset
    folds into a per-axis scalar (dot(v,W_j) - dot(mean,W_j))."""
    tmp = df.withColumn("__vd", F.col(vec_col).cast("array<double>"))
    outs = []
    for k in range(model.components.shape[0]):
        w = model.components[k]
        g = 1.0
        if whiten:
            lam = float(model.eigenvalues[k])
            g = 0.0 if lam <= eps else 1.0 / float(np.sqrt(lam))
        b = float(np.dot(model.mean, w))
        dot = F.aggregate(
            F.zip_with(
                F.col("__vd"),
                F.array(*[F.lit(float(x)) for x in w]),
                lambda a, c: a * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        outs.append((dot - F.lit(b)) * F.lit(g))
    return tmp.withColumn(out_col, F.array(*outs)).drop("__vd")
