"""Eval-set decontamination: drop training documents that overlap a
held-out evaluation set (extension X4/LLM surface; the standard
pre-training hygiene step — GPT-3's 13-gram collision rule, Brown et
al. 2020 Appendix C; Dodge et al. 2021 measured the damage of skipping
it on C4).

Semantics (matching the published rule): an eval example contributes
its normalized word 13-grams; an example SHORTER than 13 tokens
contributes itself as one gram. A corpus document is contaminated when
any sliding window of the matching length collides. The corpus side
therefore generates windows for each distinct eval gram length — at
most ``n`` distinct lengths, and in practice {13} plus a few short
ones.

Shape at 100 TB: both sides reduce to fixed-width gram HASHES
(xxhash64 of the normalized gram — document text never rides a
shuffle), the eval side is tiny by construction (benchmarks are KB-MB)
so its gram set BROADCASTS, and the flag pass is one corpus scan into
a broadcast join + map-side-combinable aggregation. The only action on
the driver is a ≤``n``-row distinct-lengths aggregate of the EVAL set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.functions.text import sliding_windows, tokens


def _norm_tokens(text_col: str):
    return F.transform(tokens(F.col(text_col)), F.lower)


def _windows(toks, length: int):
    """Sliding ``length``-token windows, space-joined; empty array when
    the document is shorter than ``length``. Linear per row via
    sliding_windows (the old sequence+slice form re-evaluated the
    captured token array per window — quadratic on long documents)."""
    return F.coalesce(
        sliding_windows(toks, length, sep=" "), F.array().cast("array<string>")
    )


def _eval_gram_hashes(eval_df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Eval grams per the GPT-3 rule: n-grams for examples with ≥ n
    tokens, the whole example as ONE gram otherwise. Output columns:
    __eval_id, __len (gram token length), __gh (xxhash64)."""
    toks = _norm_tokens(text_col)
    grams = F.when(F.size(toks) >= n, _windows(toks, n)).otherwise(
        F.when(F.size(toks) > 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )
    return (
        eval_df.select(
            F.col(id_col).alias("__eval_id"),
            F.least(F.size(toks), F.lit(n)).alias("__len"),
            F.explode(grams).alias("__gram"),
        )
        .select("__eval_id", "__len", F.xxhash64("__gram").alias("__gh"))
        .dropDuplicates(["__eval_id", "__gh"])
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    max_lengths: int = 8,
) -> DataFrame:
    """Flag corpus documents sharing at least one normalized word gram
    with the eval set (window length per the eval example's own gram
    length, so a 5-token eval item is found verbatim inside a long
    training document). Returns one row per CONTAMINATED corpus
    document: (id_col, n_collisions, n_eval_docs) — distinct colliding
    grams and distinct implicated eval examples (the audit trail
    reviewers ask for).

    EAGER at call time: runs one Spark job on the (small) eval side —
    a ≤``n``-row distinct-gram-lengths aggregate — before returning
    the lazy result DataFrame, because each distinct eval gram length
    adds a full sliding-window pass over every corpus document and the
    plan must know the lengths up front.

    ``max_lengths`` bounds that fan-out against a hostile eval set with
    many distinct short-example lengths: only the ``max_lengths`` most
    frequent gram lengths are matched (a warning names the dropped
    ones). Lengths ≤ 2 also warn — a 1–2-token eval example turns
    nearly every corpus token into a candidate window and usually
    indicates an unclean eval set rather than a real benchmark item.
    """
    e = _eval_gram_hashes(eval_df, eval_id_col or id_col, eval_text_col or text_col, n)
    lengths = trimmed_gram_lengths(e, max_lengths)
    return flag_against_prepared(corpus, e, lengths, id_col, text_col)


def trimmed_gram_lengths(
    eval_hashes: DataFrame, max_lengths: int = 8, on_trim: str = "warn"
) -> list[int]:
    """EAGER: the ≤n-row distinct-gram-lengths aggregate of a prepared
    eval side, trimmed to the ``max_lengths`` most frequent. When the
    trim actually drops lengths, ``on_trim`` decides: ``"warn"`` (the
    flag path — reviewers see partial coverage in the audit) or
    ``"raise"`` (the data-deleting :func:`decontaminate` path — skipped
    eval coverage must not silently pass contaminated documents).
    Lengths ≤ 2 always warn — degenerate eval items. The only driver
    action in the whole decontamination plan."""
    import warnings

    if on_trim not in ("warn", "raise"):
        # a typo ('Raise', 'error') must not silently degrade the
        # data-deletion guard to the warn path
        raise ValueError(f"on_trim must be 'warn' or 'raise', got {on_trim!r}")

    by_freq = (
        eval_hashes.groupBy("__len").count().orderBy(F.desc("count"), F.asc("__len")).collect()
    )
    kept = by_freq[:max_lengths]
    if len(by_freq) > max_lengths:
        dropped = sorted(r["__len"] for r in by_freq[max_lengths:])
        msg = (
            f"ngram_contamination: eval set has {len(by_freq)} distinct gram "
            f"lengths; keeping the {max_lengths} most frequent, dropping "
            f"lengths {dropped} "
            "(raise max_lengths to match them too)"
        )
        if on_trim == "raise":
            raise ValueError(
                msg + " — decontaminate() refuses to silently skip eval "
                "coverage; raise max_lengths or call with on_trim='warn' "
                "to accept partial matching"
            )
        warnings.warn(msg, stacklevel=3)
    short = sorted(r["__len"] for r in kept if r["__len"] <= 2)
    if short:
        warnings.warn(
            f"ngram_contamination: eval examples of {short} token(s) make "
            "nearly every corpus token a candidate window — check the eval "
            "set for empty/degenerate items",
            stacklevel=3,
        )
    return sorted(r["__len"] for r in kept)


def flag_against_prepared(
    corpus: DataFrame,
    eval_hashes: DataFrame,
    lengths: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus-side flag pass against a PREPARED eval side
    (``_eval_gram_hashes`` output + its distinct gram lengths). Pure
    plan construction — no Spark action — so a caller that prepares
    the eval side once (the streaming path, or repeated corpus shards
    against one benchmark suite) pays the eval aggregate once, not per
    batch."""
    if not lengths:
        schema_cols = [F.col(id_col)]
        return (
            corpus.select(*schema_cols)
            .withColumn("n_collisions", F.lit(0).cast("long"))
            .withColumn("n_eval_docs", F.lit(0).cast("long"))
            .filter(F.lit(False))
        )

    toks = _norm_tokens(text_col)

    # closure factory, NOT a default-arg lambda: F.transform treats a
    # two-parameter lambda as (element, index) and would bind ln to the
    # window index
    def _tag(ln: int):
        return lambda g: F.struct(F.lit(ln).alias("l"), g.alias("g"))

    per_len = [F.transform(_windows(toks, ln), _tag(ln)) for ln in lengths]
    all_windows = per_len[0] if len(per_len) == 1 else F.concat(*per_len)
    c = corpus.select(F.col(id_col).alias("__id"), F.explode(all_windows).alias("__w")).select(
        "__id", F.col("__w.l").alias("__len"), F.xxhash64("__w.g").alias("__gh")
    )
    hits = c.join(F.broadcast(eval_hashes), ["__len", "__gh"])
    return (
        hits.groupBy("__id")
        .agg(
            F.countDistinct("__gh").alias("n_collisions"),
            F.countDistinct("__eval_id").alias("n_eval_docs"),
        )
        .withColumnRenamed("__id", id_col)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    max_lengths: int = 8,
    on_trim: str = "raise",
) -> DataFrame:
    """The corpus minus contaminated documents (left-anti join on the
    flag frame) — all corpus columns preserved. Eager on the eval side
    at call time (see :func:`ngram_contamination`).

    Unlike the flag-only path, this DELETES data, so by default it
    RAISES if ``max_lengths`` would drop any eval gram length — a
    silently-partial eval match must not let contaminated documents
    through an automated pipeline. Pass ``on_trim="warn"`` to accept
    partial coverage explicitly."""
    e = _eval_gram_hashes(eval_df, eval_id_col or id_col, eval_text_col or text_col, n)
    lengths = trimmed_gram_lengths(e, max_lengths, on_trim=on_trim)
    flagged = flag_against_prepared(corpus, e, lengths, id_col, text_col).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")
