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
    decimal_round: int | None = None,
) -> DataFrame:
    """Corpus rows + ``weight_col``: the DSIR importance weight
    ``log p_target(doc) - log p_raw(doc)`` under bag-of-hashed-ngram
    unigram models with add-``alpha`` smoothing:

        log_w(d) = Σ_{g ∈ grams(d)}  [ log p_t(bucket(g)) − log p_r(bucket(g)) ]
        p(b) = (count(b) + alpha) / (N + alpha·n_buckets)

    The raw model is fit on ``corpus`` itself (the DSIR setup: raw =
    the big crawl being filtered); the target model on ``target``.
    Documents with no grams (empty/null text) get weight 0.0.

    ``decimal_round``: the bm25/NB determinism contract — round each
    PER-BUCKET log ratio to that many dp and sum per doc as
    DECIMAL(20,dp), so weights are exact, order-independent, and
    reproduce bit-for-bit across engines/partitionings (ln differs
    by ≤1 ulp between libms; rounding the ≤n_buckets distinct ratio
    values once absorbs it). None (default) keeps plain float sums."""
    from waterdata_spark.plans import cachereg

    # the eager normalizer actions below would otherwise re-run the
    # full corpus/target gram explode when the returned lazy plan is
    # consumed — persist the tiny (<=n_buckets-row) count frames so
    # each side's expensive scan happens exactly once (code-review r7)
    tc = cachereg.register(
        "selection.dsir_tc",
        _bucket_counts(target, text_col, n_buckets, hash_fn, use_bigrams).persist(),
    )
    rc = cachereg.register(
        "selection.dsir_rc",
        _bucket_counts(corpus, text_col, n_buckets, hash_fn, use_bigrams).persist(),
    )
    nt = tc.agg(F.sum("cnt")).first()[0] or 0
    nr = rc.agg(F.sum("cnt")).first()[0] or 0
    denom_t = math.log(nt + alpha * n_buckets)
    denom_r = math.log(nr + alpha * n_buckets)
    # the raw model IS the corpus, so rc covers every bucket a corpus
    # document can produce — a LEFT join from rc (target side broadcast,
    # missing target buckets smoothed to count 0) is complete, and
    # unlike a full outer it stays a BroadcastHashJoin
    ratio_expr = (
        F.log(F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(alpha))
        - F.lit(denom_t)
        - F.log(F.col("__cr") + F.lit(alpha))
        + F.lit(denom_r)
    )
    if decimal_round is not None:
        ratio_expr = F.round(ratio_expr, decimal_round).cast(
            f"decimal(20,{decimal_round})"
        )
    ratio = (
        rc.withColumnRenamed("cnt", "__cr")
        .join(F.broadcast(tc.withColumnRenamed("cnt", "__ct")), "bucket", "left")
        .select("bucket", ratio_expr.alias("__ratio"))
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
        .agg(F.sum("__ratio").cast("double").alias(weight_col))
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
    scales the weights (1: DSIR's sampled selection; exactly 0: the
    argmax limit — PURE top-k by weight, no noise at all, ties broken
    by ascending id; combined with ``decimal_round`` this mode is
    engine-reproducible, the oracle-twin contract). Noise is a
    salted-hash uniform per doc id, so the selection is deterministic
    and rerun-stable at every temperature.

    Returns the selected rows with ``log_w`` and the sampling key."""
    w = importance_weights(corpus, target, id_col, text_col, **weight_kwargs)
    if temperature == 0:
        return (
            w.withColumn("__key", F.col("log_w"))
            .orderBy(F.col("__key").desc(), F.col(id_col).asc())
            .limit(k)
        )
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


def lm_perplexity(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    alpha: float = 0.1,
    interp: float = 0.3,
    hash_fn: str = "xx",
    ppl_col: str = "log_ppl",
    max_broadcast_rows: int = 10_000_000,
    decimal_round: int | None = None,
    smoothing: str = "jm",
) -> DataFrame:
    """CCNet-style quality scoring (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"
    — public technique): score every corpus document by its perplexity
    under a language model trained on a REFERENCE corpus (curated
    text); low perplexity ≈ reference-like quality, and pipelines
    keep/bucket by perplexity tertiles.

    Two smoothings over the same hashed-bigram tables (``smoothing``):

    - ``'jm'`` (default, unchanged): the classical Jelinek-Mercer
      interpolation —

        p(w2 | w1) = interp·p_uni(w2) + (1-interp)·p_big(w2 | w1)
        p_uni(b)   = (cnt_uni(b) + alpha) / (N + alpha·n_buckets)
        p_big(b2|b1) = (cnt_big(b1,b2) + alpha) / (cnt_uni(b1) + alpha·n_buckets)

    - ``'kn'`` (r10): interpolated bigram KNESER-NEY (Kneser & Ney
      1995; Chen & Goodman 1999 eq. 4.15-4.16 — the smoothing KenLM,
      CCNet's actual scorer, uses), absolute discount D estimated from
      the count-of-counts (D = n1/(n1+2·n2)):

        p_kn(w|v)  = max(c(v,w)−D, 0)/c(v·) + D·N1+(v·)/c(v·) · p_cont(w)
        p_cont(w)  = (N1+(·w) + alpha) / (B + alpha·V)        [guarded]
        unseen v   → p_kn(w|v) = p_cont(w)

      where c(v·) = Σ_w c(v,w), N1+(v·)/N1+(·w) are distinct-follower/
      distinct-predecessor counts, B = distinct observed bigrams and
      V = distinct observed right buckets; the alpha terms keep unseen
      buckets finite (the hashed-vocabulary analogue of KN's unknown
      handling) and vanish relative to the exact formula as the
      reference grows. ``interp`` is ignored for 'kn' (the
      continuation term IS the interpolation). Up to the alpha guard
      the per-context distribution sums to 1 exactly:
      Σ_w p_kn(w|v) = (c(v·)−D·N1+(v·))/c(v·) + D·N1+(v·)/c(v·) = 1.

    over xxhash64 (or md5 — the pure-Python differential contract)
    token buckets. Returns corpus rows + ``ppl_col`` = mean negative
    log-probability per scored bigram (i.e. log perplexity, natural
    log; exp() of it is the perplexity). Documents with fewer than 2
    tokens get null (no bigram evidence).

    100 TB shape — identical to :func:`importance_weights`: the
    unigram table is ≤n_buckets rows and the bigram table ≤ distinct
    observed bigrams (bounded by reference size AND n_buckets²,
    practically MBs for a curated reference — it broadcasts); scoring
    is one narrow explode of corpus bigrams + two broadcast joins +
    one map-side-combinable avg per doc. The bound is ENFORCED, not
    assumed (VERDICT r7): each model table is counted once (a cheap
    action on the already-persisted frame) and broadcast only if it
    holds ≤ ``max_broadcast_rows`` rows (default 10M ≈ hundreds of MB
    — the sane ceiling for a driver-shipped table); above that the
    joins degrade to plain shuffle joins — correct, just not
    broadcast-fast — instead of a driver OOM."""
    from waterdata_spark.plans import cachereg

    if smoothing not in ("jm", "kn"):
        raise ValueError(f"smoothing must be 'jm' or 'kn', got {smoothing!r}")

    def _bigram_buckets(df: DataFrame, extra: list[str]) -> DataFrame:
        """(…extra, b1, b2) one row per bigram occurrence."""
        toks = _gram_array(F.col(text_col), use_bigrams=False)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        return df.select(*extra, F.explode(pairs).alias("__p")).select(
            *extra,
            _bucket(F.col("__p.w1"), n_buckets, hash_fn).alias("b1"),
            _bucket(F.col("__p.w2"), n_buckets, hash_fn).alias("b2"),
        )

    bc = cachereg.register(
        "selection.lm_bc",
        _bigram_buckets(reference, [])
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("cb"))
        .persist(),
    )

    def _b(df: DataFrame, small: bool) -> DataFrame:
        return F.broadcast(df) if small else df

    if smoothing == "kn":
        # one pass over the persisted bigram table for the scalar
        # statistics: B (distinct bigrams), the count-of-counts n1/n2
        # for the discount estimate — bounded driver state (3 numbers)
        st = bc.agg(
            F.count(F.lit(1)).alias("B"),
            F.sum((F.col("cb") == 1).cast("long")).alias("n1"),
            F.sum((F.col("cb") == 2).cast("long")).alias("n2"),
        ).first()
        n_big = int(st["B"] or 0)
        if n_big == 0:
            raise ValueError(
                "lm_perplexity(smoothing='kn'): reference has no bigrams"
            )
        n1, n2 = int(st["n1"] or 0), int(st["n2"] or 0)
        disc = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.5
        # left-context totals + distinct-follower counts (≤ distinct
        # left buckets rows) and distinct-predecessor counts (≤ distinct
        # right buckets rows) — both derived from bc, both persisted,
        # both broadcast under the same enforced bound
        cleft = cachereg.register(
            "selection.lm_kn_cleft",
            bc.groupBy("b1")
            .agg(F.sum("cb").alias("cl"), F.count(F.lit(1)).alias("nl"))
            .persist(),
        )
        nright = cachereg.register(
            "selection.lm_kn_nright",
            bc.groupBy("b2").agg(F.count(F.lit(1)).alias("nr")).persist(),
        )
        bc_small = n_big <= max_broadcast_rows
        cl_small = cleft.count() <= max_broadcast_rows
        n_right_buckets = nright.count()
        nr_small = n_right_buckets <= max_broadcast_rows
        scored = (
            _bigram_buckets(corpus, [id_col])
            .join(_b(bc, bc_small), ["b1", "b2"], "left")
            .join(_b(cleft, cl_small), "b1", "left")
            .join(_b(nright, nr_small), "b2", "left")
        )
        p_cont = (F.coalesce(F.col("nr"), F.lit(0)) + F.lit(alpha)) / F.lit(
            n_big + alpha * n_right_buckets
        )
        cl = F.col("cl").cast("double")
        p_kn = (
            F.greatest(F.coalesce(F.col("cb"), F.lit(0)) - F.lit(disc), F.lit(0.0))
            / cl
            + F.lit(disc) * F.col("nl") / cl * p_cont
        )
        nll = -F.log(F.when(F.col("cl").isNull(), p_cont).otherwise(p_kn))
    else:
        uni_b = _bucket(F.col("__g"), n_buckets, hash_fn)
        r_toks = reference.select(
            F.explode(_gram_array(F.col(text_col), use_bigrams=False)).alias("__g")
        ).select(uni_b.alias("b"))
        # uc feeds the n_ref action plus TWO broadcast joins — persist
        # (<=n_buckets rows) so the reference is scanned once per model
        # table (code-review r7)
        uc = cachereg.register(
            "selection.lm_uc",
            r_toks.groupBy("b").agg(F.count(F.lit(1)).alias("cu")).persist(),
        )
        n_ref = uc.agg(F.sum("cu")).first()[0] or 0
        denom_u = math.log(n_ref + alpha * n_buckets)
        # broadcast is opt-in per table, gated on a real count — both
        # frames are persisted, so each count is one cheap action; a huge
        # reference (or huge n_buckets) falls back to shuffle joins rather
        # than OOMing the driver with an unbounded broadcast
        bc_small = bc.count() <= max_broadcast_rows
        uc_small = uc.count() <= max_broadcast_rows

        scored = (
            _bigram_buckets(corpus, [id_col])
            .join(_b(bc, bc_small), ["b1", "b2"], "left")
            .join(
                _b(uc.select(F.col("b").alias("b1"), F.col("cu").alias("cu1")), uc_small),
                "b1",
                "left",
            )
            .join(
                _b(uc.select(F.col("b").alias("b2"), F.col("cu").alias("cu2")), uc_small),
                "b2",
                "left",
            )
        )
        p_uni = F.exp(
            F.log(F.coalesce(F.col("cu2"), F.lit(0)) + F.lit(alpha)) - F.lit(denom_u)
        )
        p_big = (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(alpha)) / (
            F.coalesce(F.col("cu1"), F.lit(0)) + F.lit(alpha * n_buckets)
        )
        nll = -F.log(F.lit(interp) * p_uni + F.lit(1.0 - interp) * p_big)
    if decimal_round is not None:
        # determinism contract (the bm25/NB recipe): round each
        # per-bigram NLL once, sum exactly as decimal, and take the
        # mean as one IEEE division of bit-identical inputs — so
        # log_ppl reproduces across engines/partitionings
        nll_dec = F.round(nll, decimal_round).cast(f"decimal(20,{decimal_round})")
        per_doc = scored.groupBy(id_col).agg(
            (F.sum(nll_dec).cast("double") / F.count(F.lit(1))).alias(ppl_col)
        )
    else:
        per_doc = scored.groupBy(id_col).agg(F.avg(nll).alias(ppl_col))
    return corpus.join(per_doc, id_col, "left")


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 3,
    group_col: str | None = None,
    bucket_col: str = "bucket",
    labels: list[str] | None = None,
    mode: str = "exact",
    sample_fraction: float = 0.01,
    seed: str = "qbuckets42",
) -> DataFrame:
    """Per-group equal-count score buckets — the CCNet convention
    (Wenzek et al. 2020, §4.3: split each language by perplexity into
    head/middle/tail thirds; training mixes then draw from the buckets
    they trust). Adds ``bucket_col`` (a label from ``labels``, default
    the bucket index as a string, bucket 1 = LOWEST scores = CCNet's
    "head"). Rows with a NULL score get a NULL bucket (the <2-token
    lm_perplexity contract) and never shift bucket boundaries.

    Two modes, one semantics (the literal-vs-Arrow duality pattern):

    - ``exact``: SQL-standard NTILE over (score, id) per group —
      deterministic incl. ties, and the oracle twin. A window
      partitioned by group routes EACH WHOLE GROUP through one task:
      correct at any size, but a single language of a 100 TB corpus in
      one sort is the known anti-shape — exact mode is for bounded
      groups (tests, oracles, per-shard use).
    - ``sampled``: the production path. Bucket thresholds come from a
      deterministic salted-hash sample (`sampling.hash_sample`
      semantics — rerun/partitioning stable), reduced to a
      groups × (n_buckets−1) threshold frame (bounded, broadcast);
      assignment is a broadcast join + one CASE chain per row — no
      window, no global sort, one scan. Boundary placement is
      approximate with sampling error ~O(1/√(f·|group|)); ties at a
      threshold all land in the lower bucket (documented skew from
      exact NTILE, which splits ties by position).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError("labels must have exactly n_buckets entries")
    gcol = [group_col] if group_col else []
    score = F.col(score_col)

    def lab(idx: Column) -> Column:
        if labels is None:
            return idx.cast("string")
        # when-chain, not element_at: ElementAt with a computed NULL
        # index resolves to the 4-arg form that returns the LAST
        # element instead of NULL (observed on 4.1) — a NULL bucket
        # index must stay NULL
        expr = F.when(idx == 1, F.lit(labels[0]))
        for i in range(2, n_buckets + 1):
            expr = expr.when(idx == i, F.lit(labels[i - 1]))
        return expr

    if mode == "exact":
        from pyspark.sql import Window

        # NULL scores must not shift bucket boundaries, but a filter +
        # join-back would compute the (possibly expensive) input plan
        # twice — instead the null-ness rides the window PARTITION key
        # (same single shuffle) and the null partition's ntile output
        # is masked away
        part = [F.col(c) for c in gcol] or [F.lit(1)]
        w = Window.partitionBy(*part, score.isNotNull()).orderBy(
            score.asc(), F.col(id_col).asc()
        )
        bucket = F.when(score.isNotNull(), lab(F.ntile(n_buckets).over(w)))
        return df.withColumn(bucket_col, bucket)
    if mode != "sampled":
        raise ValueError(f"unknown mode: {mode!r}")

    from waterdata_spark.operators.sampling import hash_sample

    from pyspark.sql import Window

    part = [F.col(c) for c in gcol] or [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(score.asc(), F.col(id_col).asc())
    sample = hash_sample(df.filter(score.isNotNull()), id_col, sample_fraction, seed)
    # threshold frame: per group, the max score of each non-final
    # sample bucket — groups × (n_buckets−1) rows, broadcast-sized
    thresholds = (
        sample.withColumn("__nt", F.ntile(n_buckets).over(w))
        .groupBy(*gcol)
        .agg(
            *[
                F.max(F.when(F.col("__nt") == i, score)).alias(f"__thr{i}")
                for i in range(1, n_buckets)
            ]
        )
    )
    joined = (
        df.join(F.broadcast(thresholds), gcol, "left")
        if gcol
        else df.crossJoin(F.broadcast(thresholds))
    )
    assign: Column = F.lit(n_buckets)
    for i in range(n_buckets - 1, 0, -1):
        # a missing threshold (empty/tiny sample bucket) skips its tier
        assign = F.when(score <= F.col(f"__thr{i}"), F.lit(i)).otherwise(assign)
    assign = F.when(score.isNull(), F.lit(None)).otherwise(assign)
    return joined.withColumn(bucket_col, lab(assign)).drop(
        *[f"__thr{i}" for i in range(1, n_buckets)]
    )


# ---------------------------------------------------------------------------
# Frozen-model LM scoring (r10) — the streaming/hygiene contract: fit the
# reference tables ONCE into driver-local rows, rebuild broadcast frames
# per micro-batch, score statelessly. The driver-local form is safe by the
# same bound that lets lm_perplexity broadcast its model tables (a curated
# reference's hashed tables are KB-MB); tests pin score_lm ∘ fit_lm_tables
# EXACTLY equal to lm_perplexity for both smoothings.
# ---------------------------------------------------------------------------


class LmTables:
    """Driver-local frozen LM model tables (see module note above)."""

    def __init__(self, smoothing, n_buckets, alpha, interp, hash_fn, **kw):
        self.smoothing = smoothing
        self.n_buckets = n_buckets
        self.alpha = alpha
        self.interp = interp
        self.hash_fn = hash_fn
        self.__dict__.update(kw)


def _bigram_bucket_frame(
    df: DataFrame, extra: list[str], text_col: str, n_buckets: int, hash_fn: str
) -> DataFrame:
    """(…extra, b1, b2) one row per bigram occurrence — module-level
    twin of lm_perplexity's internal helper (kept textually identical;
    the fit/score≡lm_perplexity equality test pins them together)."""
    toks = _gram_array(F.col(text_col), use_bigrams=False)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(*extra, F.explode(pairs).alias("__p")).select(
        *extra,
        _bucket(F.col("__p.w1"), n_buckets, hash_fn).alias("b1"),
        _bucket(F.col("__p.w2"), n_buckets, hash_fn).alias("b2"),
    )


def fit_lm_tables(
    reference: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    alpha: float = 0.1,
    interp: float = 0.3,
    hash_fn: str = "xx",
    smoothing: str = "jm",
) -> LmTables:
    """Fit the reference-side model tables of :func:`lm_perplexity`
    once, into driver-local pandas rows (vocabulary-bounded — the same
    size class the batch operator broadcasts)."""
    if smoothing not in ("jm", "kn"):
        raise ValueError(f"smoothing must be 'jm' or 'kn', got {smoothing!r}")
    bc = (
        _bigram_bucket_frame(reference, [], text_col, n_buckets, hash_fn)
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    bc_pdf = bc.toPandas()
    if smoothing == "kn":
        n_big = len(bc_pdf)
        if n_big == 0:
            raise ValueError("fit_lm_tables(smoothing='kn'): reference has no bigrams")
        n1 = int((bc_pdf["cb"] == 1).sum())
        n2 = int((bc_pdf["cb"] == 2).sum())
        disc = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.5
        cleft = (
            bc_pdf.groupby("b1")
            .agg(cl=("cb", "sum"), nl=("cb", "size"))
            .reset_index()
        )
        nright = bc_pdf.groupby("b2").agg(nr=("cb", "size")).reset_index()
        return LmTables(
            "kn", n_buckets, alpha, interp, hash_fn,
            bc_pdf=bc_pdf, cleft_pdf=cleft, nright_pdf=nright,
            n_big=n_big, disc=disc, n_right_buckets=len(nright),
        )
    uc = (
        reference.select(
            F.explode(_gram_array(F.col(text_col), use_bigrams=False)).alias("__g")
        )
        .select(_bucket(F.col("__g"), n_buckets, hash_fn).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    uc_pdf = uc.toPandas()
    n_ref = int(uc_pdf["cu"].sum()) if len(uc_pdf) else 0
    return LmTables(
        "jm", n_buckets, alpha, interp, hash_fn,
        bc_pdf=bc_pdf, uc_pdf=uc_pdf, n_ref=n_ref,
    )


def score_lm(
    corpus: DataFrame,
    tables: LmTables,
    id_col: str = "doc_id",
    text_col: str = "text",
    ppl_col: str = "log_ppl",
    decimal_round: int | None = None,
) -> DataFrame:
    """Score a corpus (or one micro-batch) against frozen
    :class:`LmTables` — identical formulas and output to
    :func:`lm_perplexity` (test-pinned), with every model-table join
    an explicit broadcast of a frame rebuilt on the CALLER's session
    (the foreachBatch contract: no frames captured across sessions)."""
    spark = corpus.sparkSession
    t = tables
    bc = F.broadcast(
        spark.createDataFrame(t.bc_pdf, schema="b1 long, b2 long, cb long")
    )
    scored = _bigram_bucket_frame(
        corpus, [id_col], text_col, t.n_buckets, t.hash_fn
    ).join(bc, ["b1", "b2"], "left")
    if t.smoothing == "kn":
        cleft = F.broadcast(
            spark.createDataFrame(t.cleft_pdf, schema="b1 long, cl long, nl long")
        )
        nright = F.broadcast(
            spark.createDataFrame(t.nright_pdf, schema="b2 long, nr long")
        )
        scored = scored.join(cleft, "b1", "left").join(nright, "b2", "left")
        p_cont = (F.coalesce(F.col("nr"), F.lit(0)) + F.lit(t.alpha)) / F.lit(
            t.n_big + t.alpha * t.n_right_buckets
        )
        cl = F.col("cl").cast("double")
        p_kn = (
            F.greatest(F.coalesce(F.col("cb"), F.lit(0)) - F.lit(t.disc), F.lit(0.0))
            / cl
            + F.lit(t.disc) * F.col("nl") / cl * p_cont
        )
        nll = -F.log(F.when(F.col("cl").isNull(), p_cont).otherwise(p_kn))
    else:
        uc = spark.createDataFrame(t.uc_pdf, schema="b long, cu long")
        denom_u = math.log(t.n_ref + t.alpha * t.n_buckets)
        scored = scored.join(
            F.broadcast(uc.select(F.col("b").alias("b1"), F.col("cu").alias("cu1"))),
            "b1",
            "left",
        ).join(
            F.broadcast(uc.select(F.col("b").alias("b2"), F.col("cu").alias("cu2"))),
            "b2",
            "left",
        )
        p_uni = F.exp(
            F.log(F.coalesce(F.col("cu2"), F.lit(0)) + F.lit(t.alpha)) - F.lit(denom_u)
        )
        p_big = (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(t.alpha)) / (
            F.coalesce(F.col("cu1"), F.lit(0)) + F.lit(t.alpha * t.n_buckets)
        )
        nll = -F.log(F.lit(t.interp) * p_uni + F.lit(1.0 - t.interp) * p_big)
    if decimal_round is not None:
        nll_dec = F.round(nll, decimal_round).cast(f"decimal(20,{decimal_round})")
        per_doc = scored.groupBy(id_col).agg(
            (F.sum(nll_dec).cast("double") / F.count(F.lit(1))).alias(ppl_col)
        )
    else:
        per_doc = scored.groupBy(id_col).agg(F.avg(nll).alias(ppl_col))
    return corpus.join(per_doc, id_col, "left")
