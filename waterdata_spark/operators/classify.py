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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from waterdata_spark.operators.selection import _bucket, _gram_array


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
