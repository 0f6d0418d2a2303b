"""Keyword retrieval over a document corpus — Okapi BM25 top-k
(Robertson & Spärck Jones' probabilistic relevance framework; the
BM25 form is the public-standard ranking function every search engine
ships). The LLM-pipeline uses: targeted corpus SELECTION ("find the
documents about X" for domain mixes), eval-set LEAKAGE triage beyond
exact n-gram decontamination (x21), and the sparse half of hybrid
retrieval next to the dense ANN path (operators/similarity.py).

    score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                             ───────────────────────────────
                             tf(t,d) + k1·(1 − b + b·dl/avgdl)

    idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))

100 TB shape:
- the postings list is ONE shuffle of (term, doc) token pairs into a
  grouped count — the same explode+aggregate skeleton the MinHash and
  decontamination passes use; document text never rides any later
  shuffle;
- document-frequency stats are a second, |vocab|-bounded aggregate;
  ``max_df`` drops stopword-grade terms there (df above the cap), the
  standard pruning that both bounds the inverted-index join's hottest
  keys (skew!) and removes terms carrying ~zero idf anyway;
- the QUERY side is small by contract (a query batch, not a corpus) —
  it broadcasts to the postings join, so candidate generation is
  shuffle-free beyond the postings build;
- scoring sums ride ONE map-side-combinable aggregate per (query,
  doc); top-k is a per-query window over candidates only (documents
  sharing ≥1 query term) — never a corpus-wide sort.

Determinism contract (the oracle story): per-term contributions are
rounded to 9 dp and summed as DECIMAL(38,9) — exact, order-independent
— so scores are identical bit-for-bit across engines and partitionings
(a raw double sum is associativity-dependent: two IDENTICAL documents
could otherwise rank-flip run to run). Ties break by ascending doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from waterdata_spark.functions.text import tokens


def _term_array(c, lowercase: bool):
    col = F.lower(c) if lowercase else c
    return tokens(col)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "qid",
    query_text_col: str = "qtext",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` corpus documents per query by BM25:
    ``(qid, doc_id, rank, score)``, rank 1 = best, ties by ascending
    doc id, ``score`` the (rounded-decimal-summed) BM25 value as a
    double. Query terms are DISTINCT per query (the classical
    binary-query-tf reading); documents sharing no surviving query
    term are absent. ``max_df`` drops terms whose document frequency
    exceeds it (stopword pruning / hot-key bound); ``None`` keeps all.

    The queries frame is broadcast — it is a query BATCH by contract.
    For corpus-sized "query" tables use a loop over batches (retrieval
    serving shape), not one giant call.
    """
    toks = _term_array(F.col(text_col), lowercase)
    base = docs.select(
        F.col(id_col).alias("__d"), toks.alias("__toks")
    ).select(
        "__d",
        "__toks",
        # size(null array) is -1 — a null-text document has length 0
        F.greatest(F.size("__toks"), F.lit(0)).alias("__dl"),
    )
    # N and avgdl: one bounded aggregate action (two scalars). Token
    # counts are exact ints, so sum/count divide identically everywhere.
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("s")
    ).first()
    n_docs = stats["n"] or 0
    if n_docs == 0:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, rank long, score double"
        )
    avgdl = float(stats["s"] or 0) / n_docs

    postings = (
        base.select("__d", "__dl", F.explode("__toks").alias("__t"))
        .groupBy("__t", "__d", "__dl")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = postings.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_df)
    idf = dfreq.select(
        "__t",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        ).alias("__idf"),
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("__q"),
            F.explode(_term_array(F.col(query_text_col), lowercase)).alias("__t"),
        )
        .distinct()
    )
    # term contribution as an exact decimal: identical IEEE expression
    # on both engines, rounded to 9 dp, summed order-independently
    contrib = F.round(
        F.col("__idf")
        * (F.col("__tf") * F.lit(k1 + 1.0))
        / (
            F.col("__tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
        ),
        9,
    ).cast("decimal(38,9)")
    # resolve idf for the QUERY terms first (vocab-sized frame joined
    # against the broadcast query-term set → ≤|query terms| rows), so
    # the postings join broadcasts only that sliver — never the vocab
    q_idf = idf.join(F.broadcast(qterms), "__t")
    scored = (
        postings.join(F.broadcast(q_idf), "__t")
        .groupBy("__q", "__d")
        .agg(F.sum(contrib).alias("__score"))
    )
    w = Window.partitionBy("__q").orderBy(F.col("__score").desc(), F.col("__d").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__q").alias(query_id_col),
            F.col("__d").alias(id_col),
            "rank",
            F.col("__score").cast("double").alias("score"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_id_col: str = "qid",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid-retrieval fusion by Reciprocal Rank Fusion (Cormack,
    Clarke & Büttcher 2009 — the public-standard way to combine a
    sparse BM25 ranking with a dense ANN ranking without score
    calibration):

        rrf(q, d) = Σ_lists 1 / (rrf_k + rank_list(q, d))

    Each input frame carries (query id, doc id, rank); a document
    missing from a list simply contributes nothing (the RRF
    convention). Returns ``(qid, doc_id, rank, rrf_score)`` — the
    fused top-``k`` per query, ties broken by ascending doc id.

    Determinism contract: 1/(rrf_k+rank) is rounded to 9 dp and summed
    as DECIMAL(20,9) — exact and order-independent (the bm25_topk
    recipe), so fused ranks are stable across engines/partitionings.

    Scale shape: one union of rank rows (3 small columns each — the
    candidate lists, never corpora) + one map-side-combinable sum per
    (query, doc) + a per-query window over fused candidates only.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    contrib = F.round(
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col).cast("double")), 9
    ).cast("decimal(20,9)")
    parts = [
        r.select(
            F.col(query_id_col).alias("__q"),
            F.col(id_col).alias("__d"),
            contrib.alias("__c"),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy("__q", "__d").agg(F.sum("__c").alias("__s"))
    w = Window.partitionBy("__q").orderBy(F.col("__s").desc(), F.col("__d").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__q").alias(query_id_col),
            F.col("__d").alias(id_col),
            "rank",
            F.col("__s").cast("double").alias("rrf_score"),
        )
    )
