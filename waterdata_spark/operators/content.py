"""Main-content extraction from raw HTML — the block-level boilerplate
classifier that sits between ``functions/text.html_to_text`` (which
keeps ALL text) and document-level quality gates.

The published recipe family (boilerpipe, Kohlschütter et al. WSDM
2010; jusText, Pomikálek 2011 — what RefinedWeb-class pipelines get
from trafilatura): split the page into BLOCKS at block-level tags,
score each block with shallow features — text length, link density
(anchor-text chars / text chars), stopword density — classify blocks,
and let short blocks between good neighbors inherit (headings and
single-sentence paragraphs inside an article). Navigation, footers,
and related-links rails are short and link-dense; body paragraphs are
long and link-sparse. This module implements that as pure JVM
expressions: one regexp chain (the ``html_to_text`` conventions:
script/style/comment subtrees dropped, fixed entity table), anchors
sentinel-marked BEFORE tags strip so per-block link density survives
tag removal, one ``posexplode`` over blocks, one bounded per-document
window for the neighbor rule. No UDF; linear per row; the block
window partitions by document (bounded by page block count, never
corpus-wide).

Not a spec-complete HTML5 parser (same contract as ``html_to_text``);
anchors that span a block boundary contribute to the block where they
open (the sentinel pair breaks across the split — documented
heuristic slack, not silent).

Oracle: the x11 'main' leg runs the full chain against a DuckDB twin
on deterministically synthesized pages; exact feature definitions
below are part of that contract:

- ``link_density`` = Σ len(anchor spans, raw) / max(len(block text
  with sentinels removed, raw), 1) — both sides UN-normalized.
- ``n_chars`` = length of the whitespace-normalized trimmed block.
- ``stopword_frac`` = stopword tokens / tokens (whitespace split of
  the normalized block, lowercased membership).
- block is content iff ``n_chars >= min_len`` and ``link_density <=
  max_link_density`` and ``stopword_frac >= min_stopword_frac``; a
  non-qualifying block with ``n_chars >= short_len`` and the density/
  stopword gates passing inherits content-ness when BOTH ordered
  neighbors qualify outright (the jusText near-good rule, simplified
  to one smoothing pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from waterdata_spark.functions.text import _HTML_BLOCK_BREAK, _HTML_CELL_BREAK, _HTML_ENTITIES

__all__ = ["content_blocks", "extract_main_content", "EN_STOPWORDS"]

#: Small fixed English function-word list for the stopword-density
#: feature (jusText ships per-language lists; pass your own for other
#: languages). Membership is lowercased-exact.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
    "this", "are", "from", "but", "not", "have", "has", "they",
]

_A_OPEN, _A_CLOSE = "\x01", "\x02"


def _blocks_text(html: Column) -> Column:
    """The shared regexp chain: subtree removal → anchor sentinels →
    block breaks → tag strip → entity decode. Returns newline-
    separated blocks with anchor sentinels still embedded."""
    out = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?is)<a\b[^>]*>", _A_OPEN)
    out = F.regexp_replace(out, r"(?is)</a\s*>", _A_CLOSE)
    out = F.regexp_replace(out, _HTML_BLOCK_BREAK, "\n")
    out = F.regexp_replace(out, _HTML_CELL_BREAK, " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", "")
    for entity, ch in _HTML_ENTITIES:
        out = F.regexp_replace(out, entity, ch)
    return out


def content_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_len: int = 80,
    max_link_density: float = 0.3,
    min_stopword_frac: float = 0.0,
    short_len: int = 20,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Block-level classification frame: one row per non-empty block —
    ``id_col, block_idx (long, original block order), block_text
    (normalized), n_chars, link_density, stopword_frac, is_content``.

    ``min_stopword_frac`` defaults to 0.0 (feature computed, gate off)
    — real English crawls want ~0.25-0.32 (jusText); synthetic or
    non-English corpora would gate everything out at that setting.
    """
    stopwords = EN_STOPWORDS if stopwords is None else stopwords
    raw = F.col("__blk")
    no_sent = F.translate(raw, _A_OPEN + _A_CLOSE, "")
    anchor_chars = F.aggregate(
        F.regexp_extract_all(raw, F.lit(f"{_A_OPEN}([^{_A_CLOSE}]*){_A_CLOSE}"), 1),
        F.lit(0).cast("long"),
        lambda acc, m: acc + F.length(m),
    )
    clean = F.trim(F.regexp_replace(no_sent, r"\s+", " "))
    words = F.filter(F.split(clean, r" "), lambda w: w != "")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))

    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(_blocks_text(F.col(html_col)), "\n")).alias(
                "block_idx", "__blk"
            ),
        )
        .withColumn("block_text", clean)
        .withColumn("n_chars", F.length("block_text").cast("long"))
        .filter(F.col("n_chars") > 0)
        .withColumn(
            "link_density",
            anchor_chars / F.greatest(F.length(no_sent).cast("long"), F.lit(1)),
        )
        .withColumn(
            "stopword_frac",
            n_stop.cast("double") / F.greatest(n_words, F.lit(1)).cast("double"),
        )
    )
    gates_ok = (F.col("link_density") <= max_link_density) & (
        F.col("stopword_frac") >= min_stopword_frac
    )
    base = gates_ok & (F.col("n_chars") >= min_len)
    w = Window.partitionBy(id_col).orderBy("block_idx")
    prev_good = F.coalesce(F.lag(base).over(w), F.lit(False))
    next_good = F.coalesce(F.lead(base).over(w), F.lit(False))
    near = (
        ~base
        & gates_ok
        & (F.col("n_chars") >= short_len)
        & prev_good
        & next_good
    )
    return exploded.withColumn("is_content", base | near).select(
        id_col,
        F.col("block_idx").cast("long").alias("block_idx"),
        "block_text",
        "n_chars",
        "link_density",
        "stopword_frac",
        "is_content",
    )


def extract_main_content(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    out_col: str = "main_text",
    **block_kwargs,
) -> DataFrame:
    """Adds ``out_col``: the document's content blocks joined with
    newlines in page order ('' when no block qualifies — the caller's
    quality gates drop empty documents; this operator reports, it does
    not silently delete). All other columns pass through."""
    blocks = content_blocks(df, id_col=id_col, html_col=html_col, **block_kwargs)
    main = (
        blocks.filter(F.col("is_content"))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("block_idx", "block_text"))
                    ),
                    lambda s: s["block_text"],
                ),
                "\n",
            ).alias(out_col)
        )
    )
    return df.join(main, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    )
