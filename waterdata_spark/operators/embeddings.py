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

Exactness contract (the repo-wide decimal_round recipe): the fit
reduces the corpus to FIRST and SECOND moment sums computed on
1e6-scaled integers — every component rounds ONCE, products stay in
long (1e12 max), sums ride DECIMAL(38,0) — so the moment matrix is
order-independent and bit-equal on any partitioning (test-pinned).
The eigendecomposition of that d x d matrix is driver-side
`numpy.linalg.eigh` (symmetric, LAPACK) with a deterministic sign
convention (largest-|component| positive). The pure-Python
differential recomputes the integer moments and must match EXACTLY;
eigh then agrees because its input bits agree.

100 TB shape: the fit is two combiner-friendly JVM reduces — a d-row
mean pass and an upper-triangle d(d+1)/2-row second-moment pass
(double posexplode, map-side partial aggregation: the Exchange
carries at most d(d+1)/2 rows per task). Driver state is one d x d
matrix. Projection is a narrow zero-shuffle JVM scan: out[j] =
dot(v, W_j) - b_j with W as plan literals — no UDF, whole-stage
codegen. The double explode multiplies rows by d(d+1)/2 BEFORE the
map-side combine; for d in the hundreds that is the documented cost
of exactness — an Arrow mapInPandas float64 partial-Gram path would
be ~d x cheaper per row and approximately (order-dependently) equal.

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


def fit_pca(
    df: DataFrame,
    vec_col: str,
    n_components: int,
    scale: int = 10**6,
) -> PCAModel:
    """Exact-moment PCA fit. Centering is part of the model (the mean
    rides into the projection offset); covariance uses the population
    convention (divide by n) like the differential."""
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
    second = (
        ex.select(
            "__i",
            _scaled_long(F.col("__vi"), scale).alias("__si"),
            F.posexplode("__w").alias("__j", "__vj"),
        )
        .filter(F.col("__j") >= F.col("__i"))
        .groupBy("__i", "__j")
        .agg(
            F.sum(
                (F.col("__si") * _scaled_long(F.col("__vj"), scale)).cast(
                    "decimal(38,0)"
                )
            ).alias("s2")
        )
        .collect()
    )
    S2 = np.zeros((d, d), dtype=object)
    for r in second:
        S2[r["__i"], r["__j"]] = int(r["s2"])
        S2[r["__j"], r["__i"]] = int(r["s2"])

    return _model_from_moments(s1, S2, n, d, n_components, scale)


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
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T.copy()  # (r, d)
    for k in range(comps.shape[0]):
        # deterministic sign: the largest-|component| entry is positive
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
