"""Text-analysis functions (extension surface X4; BASELINE.json
north-star "text analysis" for LLM-data pipelines).

Everything here is built from JVM-side expressions (split, regexp,
aggregate, transform, md5) — no Python UDFs — so each scales linearly
over a 100 TB documents table with zero serde overhead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/piece regex: runs of letters, runs of digits, or a
# single non-space symbol — a deterministic approximation of byte-pair
# pre-tokenization.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty strings removed)."""
    col = F.col(c) if isinstance(c, str) else c
    arr = F.split(F.trim(col), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda t: t != "")


def token_count(c: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokens(c))


def bpe_tokens(c: Column | str) -> Column:
    """Regex pre-tokenization: letters / digits / single symbols."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0)


def punct_count(c: Column | str) -> Column:
    """Number of punctuation characters (quality-scoring feature)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.length(col) - F.length(F.regexp_replace(col, r"[!-/:-@\[-`{-~]", ""))


# Tiny stopword markers per language, for the n-gram/stopword language
# heuristic. Deliberately small + deterministic so the DuckDB oracle
# can reproduce the exact scores with string arithmetic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "是", "了", "在"],
}


def lang_id_score(c: Column | str, lang: str) -> Column:
    """Count of this language's marker tokens in the text (int).

    Heuristic language-ID: argmax over ``lang_id_score`` per language.
    Marker occurrences counted as whole tokens via the tokenized array,
    so 'theory' does not count as 'the'.
    """
    toks = tokens(c)
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(markers)))


def char_shingles(c: Column | str, k: int = 8) -> Column:
    """All k-character shingles of the text → array<string>.

    Built with sequence+transform (JVM-side); the shingle set feeds
    MinHash / fingerprinting. Returns the whole text when shorter
    than k.
    """
    col = F.col(c) if isinstance(c, str) else c
    n = F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.transform(idx, lambda i: col.substr(i, F.lit(k)))


def doc_fingerprint(c: Column | str, k: int = 8) -> Column:
    """Deterministic document fingerprint: min(md5(shingle)) over all
    k-shingles — a 1-permutation MinHash usable for near-dup
    bucketing. md5 exists in both Spark and DuckDB, so this is
    oracle-checkable."""
    return F.array_min(F.transform(char_shingles(c, k), F.md5))


def lines(c: Column | str) -> Column:
    """Non-empty lines of the text → array<string>."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(col, r"\n"), lambda l: F.trim(l) != "")


def word_ngrams(c: Column | str, n: int = 2) -> Column:
    """Space-joined word n-grams → array<string> (empty when the text
    has fewer than n tokens). JVM-side: sequence + slice + array_join."""
    toks = tokens(c)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(count > 0, grams).otherwise(F.array().cast("array<string>"))


def _dup_fraction(arr: Column) -> Column:
    """1 - distinct/total over an array; 0.0 for empty arrays."""
    total = F.size(arr)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / total.cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_features(c: Column | str, ngram: int = 3) -> dict[str, Column]:
    """Within-document repetition/boilerplate signals — the standard
    pretraining-corpus filters (C4's line dedup, Raffel et al. 2020;
    Gopher's repetition thresholds, Rae et al. 2021 §A1.1), as pure
    JVM expressions:

    - ``dup_line_fraction``: fraction of non-empty lines that are
      repeats of an earlier line (C4 drops these);
    - ``dup_ngram_fraction``: fraction of word ``ngram``-grams that are
      duplicates (Gopher filters docs above ~0.1-0.2);
    - ``top_ngram_fraction``: share of all ``ngram``-grams taken by the
      most frequent one (boilerplate/template detector);
    - ``ellipsis_line_fraction`` / ``bullet_line_fraction``: lines
      ending in ellipsis / starting with a bullet (Gopher caps these).

    ``top_ngram_fraction`` is O(distinct x total) per document — fine
    for natural documents (both bounded by token count); everything
    else is linear per row and nothing shuffles.
    """
    ls = lines(c)
    grams = word_ngrams(c, ngram)
    n_grams = F.size(grams)
    top_count = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g)),
        )
    )
    return {
        "dup_line_fraction": _dup_fraction(ls),
        "dup_ngram_fraction": _dup_fraction(grams),
        "top_ngram_fraction": F.when(
            n_grams > 0, top_count.cast("double") / n_grams.cast("double")
        ).otherwise(F.lit(0.0)),
        "ellipsis_line_fraction": F.when(
            F.size(ls) > 0,
            F.size(F.filter(ls, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))).cast("double")
            / F.size(ls).cast("double"),
        ).otherwise(F.lit(0.0)),
        "bullet_line_fraction": F.when(
            F.size(ls) > 0,
            F.size(F.filter(ls, lambda l: F.trim(l).rlike(r"^([-*•‣▪]|\d+[.)])\s"))).cast("double")
            / F.size(ls).cast("double"),
        ).otherwise(F.lit(0.0)),
    }


# PII patterns, applied in order (email before phone: an email's digit
# runs must not be half-eaten by the phone pattern first)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"(?<!\d)(?:\+?1[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}(?!\d)", "<PHONE>"),
]


def redact_pii(c: Column | str) -> Column:
    """Scrub the PII classes every pretraining pipeline handles —
    emails, IPv4s, US SSNs, US phone numbers — replacing each with a
    typed placeholder token (C4 and its descendants drop or mask these
    before training). A chain of JVM-side ``regexp_replace`` calls:
    no UDF, no shuffle, linear per row.

    Deliberately pattern-scoped (regexes are auditable and cheap at
    100 TB); entity-model scrubbing (names, addresses) is a different
    cost class and belongs behind an Arrow-batched codec like the
    multimodal decoders."""
    out = F.col(c) if isinstance(c, str) else c
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-class PII occurrence counts (audit/reporting companion to
    :func:`redact_pii` — pipelines log these before deciding whether a
    document is droppable or maskable)."""
    col = F.col(c) if isinstance(c, str) else c
    return {
        token.strip("<>").lower() + "_count": F.size(
            F.regexp_extract_all(col, F.lit(pattern), 0)
        )
        for pattern, token in PII_PATTERNS
    }


def quality_features(c: Column | str) -> dict[str, Column]:
    """Quality-scoring features for an LLM-data pipeline: raw length,
    token count, mean token length, punctuation ratio, uppercase ratio."""
    col = F.col(c) if isinstance(c, str) else c
    toks = tokens(col)
    n_tok = F.size(toks)
    n_char = F.length(col)
    return {
        "n_chars": n_char,
        "n_tokens": n_tok,
        "mean_token_len": (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
            / F.greatest(n_tok, F.lit(1)).cast("double")
        ),
        "punct_ratio": punct_count(col).cast("double") / F.greatest(n_char, F.lit(1)).cast("double"),
        "upper_ratio": (
            (n_char - F.length(F.regexp_replace(col, r"[A-Z]", ""))).cast("double")
            / F.greatest(n_char, F.lit(1)).cast("double")
        ),
    }
