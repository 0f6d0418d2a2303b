"""Data selection via importance resampling (DSIR-style; Xie et al.
2023, "Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169 — a published public technique).

Select raw-corpus documents that look like a TARGET distribution
(curated text, a domain, an eval-adjacent style) without training a
classifier: fit bag-of-hashed-ngram unigram models on both sides,
weight every corpus document by its log likelihood ratio, and sample
without replacement via Gumbel-top-k.

100 TB shape — every stage is bounded or map-side combinable:

- feature space is ``n_buckets`` hashed (unigram + bigram) buckets, so
  BOTH distributions are tiny frames (≤ n_buckets rows) regardless of
  corpus size: two aggregate scans, each shuffling at most
  (tasks × buckets) partial counts;
- the log-ratio table broadcasts (n_buckets rows); per-document
  weights are one explode (narrow) → broadcast join → one map-side-
  combinable sum per doc_id — a single shuffle whose rows are
  (doc_id, partial sum), never text;
- Gumbel-top-k is ``orderBy(key desc).limit(k)`` —
  TakeOrderedAndProject, each partition keeps k rows, no global sort;
- determinism: hashing is seed-keyed xxhash64 (or md5 for the
  pure-Python differential twin in tests), the Gumbel noise is a
  salted-hash uniform, so the same inputs select the same documents on
  any cluster size or partitioning — the same rerun-stability contract
  as sampling.hash_sample.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from waterdata_spark.functions.text import tokens, word_ngrams


def _gram_array(text_col: Column, use_bigrams: bool = True) -> Column:
    """Unigrams (+ bigrams) of the text — the DSIR feature grams.
    Null text → empty array (a null document carries no evidence
    either way; its weight is 0, the neutral log ratio)."""
    uni = F.coalesce(tokens(text_col), F.array().cast("array<string>"))
    if not use_bigrams:
        return uni
    return F.concat(uni, word_ngrams(text_col, 2))


def _bucket(gram: Column, n_buckets: int, hash_fn: str) -> Column:
    """Hash a gram into [0, n_buckets). ``'xx'`` = xxhash64 production
    path; ``'md5'`` = first 15 hex digits as int — reproducible in
    pure Python (hashlib) and DuckDB, the differential-twin contract
    (same convention as dedup_approx / sampling._hash_u)."""
    if hash_fn == "xx":
        return F.pmod(F.xxhash64(gram), F.lit(n_buckets)).cast("long")
    if hash_fn == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        )
    raise ValueError(f"hash_fn must be 'xx' or 'md5', got {hash_fn!r}")


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, hash_fn: str, use_bigrams: bool
) -> DataFrame:
    """(bucket, cnt) distribution of a corpus — ≤ n_buckets rows."""
    return (
        df.select(
            F.explode(_gram_array(F.col(text_col), use_bigrams)).alias("__g")
        )
        .select(_bucket(F.col("__g"), n_buckets, hash_fn).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    hash_fn: str = "xx",
    use_bigrams: bool = True,
    weight_col: str = "log_w",
) -> DataFrame:
    """Corpus rows + ``weight_col``: the DSIR importance weight
    ``log p_target(doc) - log p_raw(doc)`` under bag-of-hashed-ngram
    unigram models with add-``alpha`` smoothing:

        log_w(d) = Σ_{g ∈ grams(d)}  [ log p_t(bucket(g)) − log p_r(bucket(g)) ]
        p(b) = (count(b) + alpha) / (N + alpha·n_buckets)

    The raw model is fit on ``corpus`` itself (the DSIR setup: raw =
    the big crawl being filtered); the target model on ``target``.
    Documents with no grams (empty/null text) get weight 0.0."""
    tc = _bucket_counts(target, text_col, n_buckets, hash_fn, use_bigrams)
    rc = _bucket_counts(corpus, text_col, n_buckets, hash_fn, use_bigrams)
    nt = tc.agg(F.sum("cnt")).first()[0] or 0
    nr = rc.agg(F.sum("cnt")).first()[0] or 0
    denom_t = math.log(nt + alpha * n_buckets)
    denom_r = math.log(nr + alpha * n_buckets)
    # the raw model IS the corpus, so rc covers every bucket a corpus
    # document can produce — a LEFT join from rc (target side broadcast,
    # missing target buckets smoothed to count 0) is complete, and
    # unlike a full outer it stays a BroadcastHashJoin
    ratio = (
        rc.withColumnRenamed("cnt", "__cr")
        .join(F.broadcast(tc.withColumnRenamed("cnt", "__ct")), "bucket", "left")
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(alpha))
                - F.lit(denom_t)
                - F.log(F.col("__cr") + F.lit(alpha))
                + F.lit(denom_r)
            ).alias("__ratio"),
        )
    )
    # ratio ≤ n_buckets rows — broadcast to the per-document gram join
    per_doc = (
        corpus.select(
            F.col(id_col),
            F.explode(_gram_array(F.col(text_col), use_bigrams)).alias("__g"),
        )
        .select(id_col, _bucket(F.col("__g"), n_buckets, hash_fn).alias("bucket"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum("__ratio").alias(weight_col))
    )
    return corpus.join(per_doc, id_col, "left").withColumn(
        weight_col, F.coalesce(F.col(weight_col), F.lit(0.0))
    )


def importance_resample(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir42",
    temperature: float = 1.0,
    **weight_kwargs,
) -> DataFrame:
    """Select ``k`` corpus documents by DSIR importance resampling
    WITHOUT replacement: Gumbel-top-k on the log weights (the
    Gumbel-max trick — adding iid Gumbel(0,1) noise to log weights and
    taking the top k draws k samples without replacement from the
    softmax of the weights; public standard result). ``temperature``
    scales the weights (→0: pure top-k by weight; 1: DSIR's sampled
    selection). Noise is a salted-hash uniform per doc id, so the
    selection is deterministic and rerun-stable.

    Returns the selected rows with ``log_w`` and the sampling key."""
    w = importance_weights(corpus, target, id_col, text_col, **weight_kwargs)
    # uniform in (0,1): 2^53-bounded non-zero mantissa from xxhash64
    u = (
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(2**53))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**53))
    gumbel = -F.log(-F.log(u))
    key = (F.col("log_w") / F.lit(max(temperature, 1e-12))) + gumbel
    return (
        w.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
    )
