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
