"""Hashed-token Naive Bayes text classification — the supervised
quality/domain/language labeler of public corpus pipelines (the same
role fastText-supervised plays in published pretraining-data recipes:
train on a small labeled seed, score the whole corpus, keep/bucket by
predicted class). Multinomial NB with additive smoothing is the
closed-form member of that family, which makes it the one that trains
as a pure AGGREGATION — no SGD loop, no driver-side iteration — and
scores as a broadcast join. Public-domain algorithm (McCallum & Nigam
1998 formulation).

    log p(c | d) ∝ log prior(c) + Σ_{t ∈ d} log p(bucket(t) | c)
    p(b | c) = (cnt(b,c) + α) / (N_c + α·n_buckets)

over seed-keyed hashed token buckets (the same hashed feature space
DSIR and lm_perplexity use — `operators/selection`).

100 TB shape:
- TRAIN is two aggregate scans of the (small) labeled frame: per-class
  bucket counts (≤ classes × n_buckets rows) and per-class totals
  (|classes| rows). The model is a DataFrame — checkpointable,
  inspectable, joinable.
- SCORE is one narrow explode of corpus tokens + ONE broadcast join
  against the model + one map-side-combinable sum per (doc, class) +
  a per-doc window argmax over |classes| rows. The broadcast is
  counted and bounded (``max_broadcast_rows``, the lm_perplexity r8
  contract) — an oversized model degrades to a shuffle join instead of
  a driver OOM.
- Unseen buckets never materialize: because the hit term and the
  unseen term share the denominator (N_c + α·B), the per-hit
  adjustment collapses to ln((cnt+α)/α) and a doc's class score is
  log prior(c) + n_tokens·log_unseen(c) + Σ_hits ln((cnt+α)/α) —
  only HIT buckets ride the join.

Determinism contract: per-token contributions are rounded to 9 dp and
summed as DECIMAL(20,9) (the bm25_topk recipe) — exact and
order-independent, so scores and argmax reproduce bit-for-bit across
engines and partitionings; class ties break to the lexicographically
smallest label.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from waterdata_spark.operators.selection import _bucket, _gram_array
from waterdata_spark.plans import cachereg


def nb_train(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    hash_fn: str = "xx",
) -> DataFrame:
    """Per-(class, bucket) token counts plus per-class totals:
    ``(label, b, cnt, n_class, n_docs_class)``. Pure aggregation —
    rerun-stable, no RNG. Smoothing happens at SCORE time (α lives
    there), so one trained model serves any α."""
    toks = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(_gram_array(F.col(text_col), use_bigrams=False)).alias("__g"),
    ).select("label", _bucket(F.col("__g"), n_buckets, hash_fn).alias("b"))
    counts = toks.groupBy("label", "b").agg(F.count(F.lit(1)).alias("cnt"))
    totals = labeled.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs_class")
    )
    class_tok = toks.groupBy("label").agg(F.count(F.lit(1)).alias("n_class"))
    return counts.join(class_tok, "label").join(totals, "label")


def nb_score(
    corpus: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    alpha: float = 1.0,
    hash_fn: str = "xx",
    label_out: str = "predicted",
    score_out: str = "nb_log_prob",
    max_broadcast_rows: int = 10_000_000,
) -> DataFrame:
    """Corpus rows + ``label_out`` (argmax class, ties broken to the
    lexicographically smallest label) + ``score_out`` (that class's
    joint log probability, natural log, as a double). Documents with
    no tokens get the prior-only argmax. ``n_buckets``/``hash_fn``
    MUST match the ones used at :func:`nb_train`."""
    # driver-local per-class constants: |classes| rows — one bounded
    # action, same contract as lm_perplexity's n_ref
    stats = {
        r["label"]: (r["n_class"], r["n_docs_class"])
        for r in model.select("label", "n_class", "n_docs_class").distinct().collect()
    }
    if not stats:
        raise ValueError("nb_score: empty model (no classes)")
    labels = sorted(stats)
    n_docs_total = sum(nd for _, nd in stats.values())
    log_prior = {c: round(math.log(stats[c][1] / n_docs_total), 9) for c in labels}
    log_unseen = {
        c: round(math.log(alpha) - math.log(stats[c][0] + alpha * n_buckets), 9)
        for c in labels
    }

    toks = corpus.select(
        F.col(id_col).alias("__d"),
        F.explode(_gram_array(F.col(text_col), use_bigrams=False)).alias("__g"),
    ).select("__d", _bucket(F.col("__g"), n_buckets, hash_fn).alias("b"))
    ntok = toks.groupBy("__d").agg(F.count(F.lit(1)).alias("__n"))
    all_doc_ids = corpus.select(F.col(id_col).alias("__d")).join(
        ntok, "__d", "left"
    ).select("__d", F.coalesce("__n", F.lit(0)).alias("__n"))

    # per-hit adjustment ln((cnt+α)/α): the (N_c+αB) denominators of
    # the hit and unseen terms cancel, so this is class-map-free
    mdl = model.select(
        "label",
        "b",
        F.round(F.log((F.col("cnt") + F.lit(alpha)) / F.lit(alpha)), 9)
        .cast("decimal(20,9)")
        .alias("__adj"),
    )
    mdl_j = F.broadcast(mdl) if mdl.count() <= max_broadcast_rows else mdl
    hits = (
        toks.join(mdl_j, "b")
        .groupBy("__d", "label")
        .agg(F.sum("__adj").alias("__hit_adj"))
    )

    def _class_map(vals: dict) -> F.Column:
        return F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in labels]),
                F.array(*[F.lit(vals[c]) for c in labels]),
            ),
            F.col("label"),
        )

    spark = corpus.sparkSession
    classes = spark.createDataFrame([(c,) for c in labels], "label string")
    scored = (
        all_doc_ids.crossJoin(F.broadcast(classes))
        .join(hits, ["__d", "label"], "left")
        .select(
            "__d",
            "label",
            (
                _class_map(log_prior).cast("decimal(20,9)")
                + (F.col("__n") * _class_map(log_unseen)).cast("decimal(20,9)")
                + F.coalesce(
                    F.col("__hit_adj"), F.lit(0).cast("decimal(20,9)")
                )
            ).alias("__score"),
        )
    )
    w = Window.partitionBy("__d").orderBy(F.col("__score").desc(), F.col("label").asc())
    best = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("__d").alias(id_col),
            F.col("label").alias(label_out),
            F.col("__score").cast("double").alias(score_out),
        )
    )
    return corpus.join(best, id_col, "left")


# ---------------------------------------------------------------------------
# Binary logistic regression over hashed-token features — the model the
# published quality-classifier recipes actually fit (GPT-3 appendix A trains
# LR over document features to score "quality"; CCNet/fastText's supervised
# mode is a linear classifier over averaged hashed-ngram features; NB above
# is the closed-form sibling). LR has no closed form, so training is ITERATED
# AGGREGATION — the Lloyd's-k-means execution shape (`operators/clustering`):
# each epoch is one full-batch gradient computed as two combiner-friendly
# reduces, the ≤n_buckets-row gradient is collected, and the weight update
# runs driver-side on that bounded state.
#
#     x_db = cnt(d, b) / n_d          (mean-of-one-hots, the fastText form)
#     m_d  = bias + Σ_b w_b · x_db
#     p_d  = σ(m_d);   resid_d = p_d − y_d
#     ∂L/∂w_b = (1/n) Σ_d resid_d · x_db + λ·w_b
#
# 100 TB shape: TRAIN runs on the (small) labeled seed — the per-(doc,
# bucket) feature frame is built once (one explode + one groupBy) and
# persisted; each of the n_iter epochs is one margin reduce (per-doc rows)
# plus one gradient reduce (≤ active-bucket rows), both map-side combining;
# driver state is ≤ n_buckets doubles (the k·dim contract). SCORE over the
# full corpus is one narrow explode + ONE counted-and-bounded broadcast join
# against the weights + one map-side-combinable per-doc sum — no windows, no
# iteration, no driver loops.
#
# Determinism contract (the decimal_round recipe shared with BM25 / NB /
# k-means): per-(doc,bucket) margin and gradient terms round once to
# ``contrib_dp`` and sum as DECIMAL(38,contrib_dp); residuals round to
# ``resid_dp``; driver weight updates round HALF_UP to ``weight_dp``. Every
# shuffled sum is therefore order-independent, so the fitted weights — and
# every downstream probability — are bit-equal across partitionings and
# engines (the x28 'lr' oracle leg unrolls two full epochs in DuckDB and
# hash-matches probabilities; `lr_python` is the exact pure-Python twin).
#
# Streaming ingest: `lr_score`'s per-doc margin is an aggregation, so on a
# stream apply it per micro-batch via `foreachBatch` (the documented Spark
# route for batch-shaped transforms) — the model is frozen driver state, so
# batch and stream scores are identical by construction.
# ---------------------------------------------------------------------------


def _round_half_up(x: float, dp: int) -> float:
    """HALF_UP decimal rounding of a double, bit-matching Spark's
    ``F.round`` (BigDecimal HALF_UP on the exact binary value) — Python's
    built-in ``round`` is banker's and would diverge on exact halves."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP))


@dataclass
class LRModel:
    """Fitted binary LR: hashed-bucket weights + bias, plus the feature-
    space parameters a scorer must reuse. Exact JSON round-trip (shortest
    round-trip float repr), the train-once / score-everywhere split."""

    weights: dict = field(default_factory=dict)  # bucket(int) -> weight(float)
    bias: float = 0.0
    n_buckets: int = 1 << 18
    hash_fn: str = "xx"
    n_iter: int = 0

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "weights": {str(b): float(w) for b, w in sorted(self.weights.items())},
                "bias": float(self.bias),
                "n_buckets": self.n_buckets,
                "hash_fn": self.hash_fn,
                "n_iter": self.n_iter,
            }
        )

    @staticmethod
    def from_json(s: str) -> "LRModel":
        import json

        d = json.loads(s)
        return LRModel(
            weights={int(b): float(w) for b, w in d["weights"].items()},
            bias=float(d["bias"]),
            n_buckets=int(d["n_buckets"]),
            hash_fn=d["hash_fn"],
            n_iter=int(d["n_iter"]),
        )


def _doc_features(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, hash_fn: str
) -> DataFrame:
    """Per-(doc, bucket) count frame ``(__d, b, cnt, __n)``. The doc's
    total token count ``__n`` (the feature normalizer) is computed
    NARROWLY from the source row (`F.size` of the gram array) before the
    explode and rides the groupBy key — one shuffle total, no
    length-join. Token-free docs produce no rows."""
    g = df.select(
        F.col(id_col).alias("__d"),
        _gram_array(F.col(text_col), use_bigrams=False).alias("__gs"),
    ).select("__d", F.size("__gs").alias("__n"), F.explode("__gs").alias("__g"))
    return (
        g.select("__d", "__n", _bucket(F.col("__g"), n_buckets, hash_fn).alias("b"))
        .groupBy("__d", "__n", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _margin_sum(feats: DataFrame, wdf: DataFrame, contrib_dp: int) -> DataFrame:
    """Per-doc Σ round(w·cnt/n, contrib_dp) as an exact decimal — the
    order-independent dot product. Buckets absent from ``wdf`` contribute
    nothing (weight 0), so the join is inner."""
    term = F.round(F.col("__w") * F.col("cnt") / F.col("__n"), contrib_dp).cast(
        f"decimal(38,{contrib_dp})"
    )
    return (
        feats.join(wdf, "b")
        .select("__d", term.alias("__t"))
        .groupBy("__d")
        .agg(F.sum("__t").alias("__m"))
    )


def lr_train(
    labeled: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    hash_fn: str = "xx",
    n_iter: int = 8,
    learning_rate: float = 0.5,
    l2: float = 0.0,
    resid_dp: int = 7,
    contrib_dp: int = 12,
    weight_dp: int = 9,
    max_broadcast_rows: int = 10_000_000,
) -> LRModel:
    """Full-batch gradient-descent fit of binary LR on a labeled seed
    frame (``label_col`` must be 0/1). Deterministic: no RNG, zero-init
    weights, every shuffled sum decimal-exact — refits are bit-identical
    on any partitioning (test-pinned). The feature frame is persisted for
    the epoch loop and released via the cache registry.

    The labeled seed is assumed SMALL relative to the corpus (the
    published recipes train on 10⁴–10⁶ docs and score 10¹⁰) — each epoch
    is two bounded reduces over it, n_iter·2 jobs total. Scoring the
    corpus (`lr_score`) is the single-pass broadcast side."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    feats = cachereg.register(
        "classify.lr_feats",
        _doc_features(labeled, id_col, text_col, n_buckets, hash_fn).persist(),
    )
    ydf = cachereg.register(
        "classify.lr_y",
        labeled.select(
            F.col(id_col).alias("__d"),
            F.col(label_col).cast("double").alias("__y"),
        ).persist(),
    )
    stats = ydf.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__y").alias("lo"),
        F.max("__y").alias("hi"),
    ).first()
    n = int(stats["n"])
    if n == 0:
        raise ValueError("lr_train: empty labeled frame")
    if stats["lo"] not in (0.0, 1.0) or stats["hi"] not in (0.0, 1.0):
        raise ValueError(
            f"lr_train: {label_col} must be 0/1, saw range "
            f"[{stats['lo']}, {stats['hi']}]"
        )
    spark = labeled.sparkSession
    # zero-init over every OBSERVED bucket: ≤ n_buckets rows of driver
    # state, the k·dim contract
    weights: dict = {
        int(r["b"]): 0.0 for r in feats.select("b").distinct().collect()
    }
    bias = 0.0

    for _ in range(n_iter):
        wdf = spark.createDataFrame(
            [(b, w) for b, w in sorted(weights.items())] or [(None, None)],
            "b long, __w double",
        )
        if len(weights) <= max_broadcast_rows:
            wdf = F.broadcast(wdf)
        margins = _margin_sum(feats, wdf, contrib_dp)
        resid = (
            ydf.join(margins, "__d", "left")
            .select(
                "__d",
                F.round(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                F.lit(bias)
                                + F.coalesce(
                                    F.col("__m").cast("double"), F.lit(0.0)
                                )
                            )
                        )
                    )
                    - F.col("__y"),
                    resid_dp,
                ).alias("__r"),
            )
        )
        resid = cachereg.register("classify.lr_resid", resid.persist())
        bias_grad = resid.agg(
            F.sum(F.col("__r").cast(f"decimal(20,{resid_dp})")).alias("g")
        ).first()["g"]
        gterm = F.round(F.col("__r") * F.col("cnt") / F.col("__n"), contrib_dp).cast(
            f"decimal(38,{contrib_dp})"
        )
        grows = (
            feats.join(resid.select("__d", "__r"), "__d")
            .select("b", gterm.alias("__t"))
            .groupBy("b")
            .agg(F.sum("__t").alias("g"))
            .collect()
        )
        grad = {int(r["b"]): float(r["g"]) for r in grows}
        weights = {
            b: _round_half_up(
                w - learning_rate * (grad.get(b, 0.0) / n + l2 * w), weight_dp
            )
            for b, w in weights.items()
        }
        bias = _round_half_up(bias - learning_rate * (float(bias_grad) / n), weight_dp)
    return LRModel(
        weights=weights,
        bias=bias,
        n_buckets=n_buckets,
        hash_fn=hash_fn,
        n_iter=n_iter,
    )


def lr_score(
    corpus: DataFrame,
    model: LRModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    prob_out: str = "lr_prob",
    pred_out: str = "lr_pred",
    prob_dp: int = 7,
    contrib_dp: int = 12,
    max_broadcast_rows: int = 10_000_000,
) -> DataFrame:
    """Corpus rows + ``prob_out`` (σ(margin), rounded to ``prob_dp`` —
    bit-reproducible) + ``pred_out`` (1 iff prob ≥ 0.5). One explode, one
    counted-and-bounded broadcast join (the weight count is driver-local,
    so the bound check is free), one map-side per-doc sum — the 100 TB
    single-pass scoring shape. Token-free docs score σ(bias)."""
    spark = corpus.sparkSession
    wdf = spark.createDataFrame(
        [(b, w) for b, w in sorted(model.weights.items())] or [(None, None)],
        "b long, __w double",
    )
    if len(model.weights) <= max_broadcast_rows:
        wdf = F.broadcast(wdf)
    feats = _doc_features(corpus, id_col, text_col, model.n_buckets, model.hash_fn)
    margins = _margin_sum(feats, wdf, contrib_dp)
    prob = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.lit(model.bias)
                    + F.coalesce(F.col("__m").cast("double"), F.lit(0.0))
                )
            )
        ),
        prob_dp,
    )
    scored = (
        corpus.join(
            margins.withColumnRenamed("__d", id_col), id_col, "left"
        )
        .withColumn(prob_out, prob)
        .withColumn(pred_out, (F.col(prob_out) >= 0.5).cast("int"))
        .drop("__m")
    )
    return scored


def lr_python(
    docs: dict,
    n_buckets: int,
    n_iter: int,
    learning_rate: float = 0.5,
    l2: float = 0.0,
    resid_dp: int = 7,
    contrib_dp: int = 12,
    weight_dp: int = 9,
) -> tuple[dict, float]:
    """Exact pure-Python twin of :func:`lr_train` on the md5 bucket path
    — the differential oracle. ``docs``: id -> (y, text). Same whitespace
    tokenization, same md5 bucketing, same HALF_UP decimal rounding at
    every contract point (decimal-module quantize == BigDecimal HALF_UP
    on the exact binary double), same integer-exact decimal sums (scaled
    ints). Returns (weights, bias)."""
    import hashlib
    import re
    from decimal import ROUND_HALF_UP, Decimal

    def rhu(x: float, dp: int) -> float:
        return float(
            Decimal(x).quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP)
        )

    def rhu_scaled(x: float, dp: int) -> int:
        # the DECIMAL(38,dp) value of F.round(x, dp) as a scaled int:
        # exact, order-independent summation
        return int(
            Decimal(x).quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP)
            .scaleb(dp)
        )

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets

    feats: dict = {}  # id -> {b: cnt}
    nlen: dict = {}  # id -> n_d
    ys: dict = {}
    for d, (y, text) in docs.items():
        ts = [t for t in re.split(r"\s+", (text or "").strip(" ")) if t != ""]
        cnts: dict = {}
        for t in ts:
            b = bucket(t)
            cnts[b] = cnts.get(b, 0) + 1
        feats[d], nlen[d], ys[d] = cnts, len(ts), float(y)
    n = len(docs)
    weights = {b: 0.0 for cnts in feats.values() for b in cnts}
    bias = 0.0
    for _ in range(n_iter):
        grad_s: dict = {b: 0 for b in weights}
        bias_s = 0
        for d, cnts in feats.items():
            m_s = sum(
                rhu_scaled(weights[b] * c / nlen[d], contrib_dp)
                for b, c in cnts.items()
            )
            m = bias + float(Decimal(m_s).scaleb(-contrib_dp))
            r = rhu(1.0 / (1.0 + math.exp(-m)) - ys[d], resid_dp)
            bias_s += rhu_scaled(r, resid_dp)
            for b, c in cnts.items():
                grad_s[b] += rhu_scaled(r * c / nlen[d], contrib_dp)
        weights = {
            b: rhu(
                w
                - learning_rate
                * (float(Decimal(grad_s[b]).scaleb(-contrib_dp)) / n + l2 * w),
                weight_dp,
            )
            for b, w in weights.items()
        }
        bias = rhu(
            bias - learning_rate * (float(Decimal(bias_s).scaleb(-resid_dp)) / n),
            weight_dp,
        )
    return weights, bias


def pr_sweep(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Operating-point sweep for a trained quality/domain classifier
    (r11): for each candidate threshold t, the EXACT confusion counts
    of the rule ``predict positive iff score >= t`` against a boolean/
     0-1 ``label_col`` — ``(threshold, tp, fp, fn, tn)``, one row per
    threshold. This is how a published pipeline picks its
    keep-threshold (GPT-3 appendix A trains the LR quality classifier,
    then chooses the document-keep operating point from exactly this
    precision/recall trade); precision/recall/F1 are one arithmetic
    step on the integer counts — shipped as counts so the row is
    engine-exact (floats would hash-differ).

    Output grain (ADVICE r11): one row per DISTINCT threshold, in
    ASCENDING threshold order — duplicates in the input list collapse
    and caller order is not preserved, so join results back on the
    ``threshold`` column rather than zipping against the input list.

    Scale shape: ONE narrow scan bucketizes each row by how many
    thresholds its score clears (the rule is monotone in t, so a row's
    entire sweep membership is one integer) into a
    ``(bucket, label) -> count`` aggregate bounded by
    ``(|thresholds|+1) x 2`` rows; the per-threshold counts are then
    suffix sums over that tiny frame (a bounded non-equi join of the
    |T|-row threshold frame against it — never a corpus-wide pass per
    threshold; the naive form scans the corpus |T| times). NULL and
    NaN scores and NULL labels are excluded (counted rows only — a
    NaN is not NULL and Spark orders it ABOVE every double, so without
    the explicit guard a 0/0-produced NaN score would count as
    clearing every threshold; r11 review catch).
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    ts = sorted(set(float(t) for t in thresholds))
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    # bucket = number of thresholds the score clears; clears ts[:i]
    arr = F.array(*[F.lit(t) for t in ts])
    bucket = F.size(F.filter(arr, lambda t: s >= t))
    counts = (
        scored.filter(s.isNotNull() & ~F.isnan(s) & y.isNotNull())
        .select(bucket.alias("__k"), y.alias("__y"))
        .groupBy("__k", "__y")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    spark = scored.sparkSession
    tdf = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(ts)], "__rank int, threshold double"
    )
    # a row with bucket k clears thresholds ranked 1..k, so threshold
    # rank r's positive-prediction set is every bucket k >= r
    # tiny ((|T|+1) x 2 rows), scanned twice below; registered so the
    # previous sweep's cache releases (the module's cachereg convention)
    counts = cachereg.register("classify.pr_sweep", counts.persist())
    joined = F.broadcast(tdf).join(counts, F.col("__k") >= F.col("__rank"), "left")
    per_t = joined.groupBy("__rank", "threshold").agg(
        F.sum(F.when(F.col("__y") == 1, F.col("__n")).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("__y") == 0, F.col("__n")).otherwise(0)).alias("fp"),
    )
    # totals from the SAME bounded counts frame — the corpus is scanned
    # exactly once for the whole sweep
    totals = counts.agg(
        F.sum(F.when(F.col("__y") == 1, F.col("__n")).otherwise(0)).alias("__pos"),
        F.sum("__n").alias("__all"),
    )
    return (
        per_t.crossJoin(F.broadcast(totals))
        .select(
            "threshold",
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            F.coalesce(F.col("fp"), F.lit(0)).cast("long").alias("fp"),
            (F.col("__pos") - F.coalesce(F.col("tp"), F.lit(0)))
            .cast("long")
            .alias("fn"),
            (
                F.col("__all")
                - F.col("__pos")
                - F.coalesce(F.col("fp"), F.lit(0))
            )
            .cast("long")
            .alias("tn"),
        )
    )
