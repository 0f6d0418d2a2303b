"""Training-data shaping: token-bounded document chunking (token-exact
and sentence-preserving), fixed-budget sequence packing (running-sum
minimum-bin form and capacity-respecting best-fit-decreasing form),
within-bin document offsets, and the loader-facing bin manifest
(LLM-pipeline surface beyond the reference's own operators; companion
to functions/text.py X4 and the token-id tail in operators/vocab.py).

Everything except the BFD packer is pure JVM expression pipelines —
sequence/slice/explode/window — no Python UDFs: one narrow pass for
chunking, one bounded shuffle for packing. The BFD packer's in-stream
best-fit placement is inherently sequential (the documented non-SQL
class); it runs Arrow-batched per stream over an (id, n_tokens,
stream_id) projection so document payloads never enter the pandas
group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from waterdata_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 0,
    tokenizer=tokens,
) -> DataFrame:
    """Split each document into whitespace-token windows of at most
    ``max_tokens`` tokens, consecutive chunks overlapping by
    ``overlap`` tokens (context-preserving splits for training/RAG
    ingestion). Output: one row per chunk with

    - ``chunk_idx``   0-based position within the document (long),
    - ``chunk_text``  the token window re-joined with single spaces,
    - ``n_chunk_tokens`` tokens in this window (long).

    Whitespace runs inside the source text are NOT preserved (tokens
    re-join with one space) — the operator's contract is token
    windows, not byte fidelity; fingerprint-sensitive callers hash the
    original text before chunking.

    Plan shape: ``tokens`` → ``sequence(0, n_chunks-1)`` →
    ``posexplode`` → ``slice`` — a single narrow stage (no shuffle,
    no UDF), so it pipelines with the scan at any scale. Empty/
    whitespace-only documents produce zero rows (nothing to train on).
    Stride is ``max_tokens - overlap``; ``overlap`` must be smaller
    than ``max_tokens``.

    ``tokenizer`` maps a column to array<string> (default: whitespace
    ``tokens``; pass ``functions.text.bpe_tokens`` to budget in BPE-ish
    pieces — closer to what a model tokenizer charges). Chunk text
    re-joins the pieces with single spaces either way.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap=} {max_tokens=}")
    stride = max_tokens - overlap
    toks = tokenizer(text_col)
    n = F.size(toks)
    # number of stride-aligned windows covering all n tokens:
    # ceil((n - overlap) / stride), at least 1 for any non-empty doc
    n_chunks = F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)))
    out = (
        df.withColumn("__toks", toks)
        .filter(F.size("__toks") > 0)
        .select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias(
                "chunk_idx", "__c"
            ),
            F.col("__toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                F.col("__toks"), F.col("__c") * stride + 1, F.lit(max_tokens)
            ).alias("__window"),
        )
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.array_join("__window", " ").alias("chunk_text"),
        F.size("__window").cast("long").alias("n_chunk_tokens"),
    )


#: Default stream count for :func:`pack_sequences`. A fixed constant —
#: NOT derived from cluster parallelism — so the default-argument
#: packing is identical on a laptop and a 1000-executor cluster. 256
#: streams keep every executor busy at any realistic size while the
#: per-stream window state stays tiny.
DEFAULT_PACK_STREAMS = 256


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 512,
    n_streams: int = DEFAULT_PACK_STREAMS,
    tokenizer=tokens,
    stream_hash=None,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence
    (bin): output adds ``stream_id``, ``bin_id``, ``bin_tokens``.

    Distributed sequential packing — the standard scale approximation
    of bin packing: documents are hash-partitioned into ``n_streams``
    independent streams (default ``DEFAULT_PACK_STREAMS`` = 256, a
    fixed constant), each stream orders its documents deterministically
    (token count DESC, id ASC — first-fit-decreasing order) and fills
    bins by running token count:
    ``bin_id = floor((cumsum - n_tokens) / budget)``. Each bin's
    content is deterministic under any cluster size — including with
    default arguments — because streams are content-hash partitions
    with a fixed count, not task partitions.

    ``stream_hash``: optional function mapping the id column name to a
    non-negative long Column used for stream assignment (default:
    ``xxhash64`` — fastest). Pass a portable hash (e.g. md5-based) when
    the packing must be reproducible on a non-Spark engine; the oracle
    twin of the registered x18 query does exactly that.

    Waste bound: a bin overflows only by the document that crosses the
    boundary, so per-bin padding waste is < max_doc_tokens/budget of
    the budget; documents longer than the budget get a bin of their
    own (callers chunk first — see :func:`chunk_documents`).

    Plan shape: one shuffle (hash repartition on the stream), one
    window per stream — no global sort, no driver state. The exact
    first-fit-decreasing packing is inherently sequential; this is the
    scalable form used by large training-data pipelines.
    """
    if stream_hash is None:
        stream_hash = lambda c: F.xxhash64(F.col(c).cast("string"))  # noqa: E731
    w = Window.partitionBy("stream_id").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    out = (
        df.withColumn("n_tokens", F.size(tokenizer(text_col)).cast("long"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "stream_id",
            F.pmod(stream_hash(id_col), F.lit(n_streams)).cast("int"),
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(budget_tokens)).cast("long"),
        )
    )
    bin_tot = Window.partitionBy("stream_id", "bin_id")
    return out.withColumn("bin_tokens", F.sum("n_tokens").over(bin_tot)).drop("__cum")


def pack_sequences_bfd(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 512,
    n_streams: int = DEFAULT_PACK_STREAMS,
    tokenizer=tokens,
    stream_hash=None,
) -> DataFrame:
    """Capacity-respecting packing: best-fit-decreasing within each
    stream (Johnson 1973's BFD, the classic 11/9·OPT+1 bin-packing
    heuristic). Same output contract as :func:`pack_sequences`
    (``stream_id``, ``bin_id``, ``bin_tokens``), but **no bin ever
    exceeds the budget** — the property a fixed-context training run
    needs when overflowing documents cannot simply be truncated — at
    the price of bins that close below budget (FFD/BFD waste instead
    of overflow; :func:`pack_sequences`'s running-sum form overflows
    each bin by at most the boundary document and uses the minimum bin
    count).

    A document longer than the budget gets a bin of its own (callers
    chunk first — :func:`chunk_documents`).

    Deterministic: streams are content-hash partitions with a fixed
    count (identical on any cluster size); within a stream, items
    place in (token count DESC, id ASC) order into the open bin with
    the LEAST remaining capacity that fits (smallest bin id on ties),
    and bin ids are assigned in opening order. Pinned by an
    independent quadratic differential in tests.

    Scale shape (r11, VERDICT r10 item 2): the packing pass runs on a
    ``(id_col, n_tokens, stream_id)`` PROJECTION — a stream group is
    ~24 bytes/doc in the pandas frame at ANY document width — and the
    ``(bin_id, bin_tokens)`` assignments join back to the full rows by
    ``id_col``. (The r10 form carried every input column, including
    the document payload, through the ``applyInPandas`` group: at
    100 TB / 256 default streams that is a ~400 GB single pandas
    allocation per task — an OOM cliff the 500k-doc probe could not
    see.) Cost: one shuffle for the stream hash over NARROW rows, one
    join shuffle on ``id_col`` for the payload — fine-grained,
    spillable exchanges instead of one monolithic per-stream frame.
    Packing is inherently sequential per stream; the sequential state
    is the open-bin capacity list, O(bins) per stream, and streams are
    the parallelism unit. The in-stream algorithm is O(n log n) via a
    sorted capacity list. ``id_col`` must be unique (it is the join-
    back key; duplicate ids would also make the deterministic
    (n_tokens DESC, id ASC) visit order ambiguous).

    The input plan is evaluated twice (the slim packing leg + the
    join's payload leg) — **it must therefore be deterministic across
    evaluations** (the split-plan correctness contract cap_per_group
    and dedup_against_exact document): a ``rand()`` column, unseeded
    sampling, or a changing source can make the legs disagree and
    silently drop rows at the inner join; persist/checkpoint such an
    input first. The tokenizer runs ONCE (in the slim leg — the join
    carries its n_tokens back), so the second evaluation is a plain
    payload scan.
    """
    import bisect

    import pandas as pd

    if stream_hash is None:
        stream_hash = lambda c: F.xxhash64(F.col(c).cast("string"))  # noqa: E731

    slim = (
        df.withColumn("n_tokens", F.size(tokenizer(text_col)).cast("long"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "stream_id",
            F.pmod(stream_hash(id_col), F.lit(n_streams)).cast("int"),
        )
        .select(id_col, "n_tokens", "stream_id")
    )
    out_schema = slim.withColumn("bin_id", F.lit(0).cast("long")).withColumn(
        "bin_tokens", F.lit(0).cast("long")
    ).schema

    budget = int(budget_tokens)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        open_bins: list[tuple[int, int]] = []  # (remaining, bin_id), sorted
        next_bin = 0
        bin_ids = []
        for s in pdf["n_tokens"].astype("int64"):
            s = int(s)
            i = bisect.bisect_left(open_bins, (s, -1))
            if s <= budget and i < len(open_bins):
                rem, b = open_bins.pop(i)
                if rem - s > 0:
                    bisect.insort(open_bins, (rem - s, b))
            else:
                b = next_bin
                next_bin += 1
                if budget - s > 0:
                    bisect.insort(open_bins, (budget - s, b))
            bin_ids.append(b)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_tokens"] = pdf.groupby("bin_id")["n_tokens"].transform("sum")
        return pdf

    # n_tokens/stream_id ride BACK from the assignments (computed once
    # in the slim leg) — the payload leg never re-runs the tokenizer
    assignments = slim.groupBy("stream_id").applyInPandas(_pack, out_schema)
    base = df.drop("n_tokens", "stream_id")
    return base.join(assignments, id_col).select(
        *base.columns, "n_tokens", "stream_id", "bin_id", "bin_tokens"
    )


def batch_by_length(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 32,
    n_streams: int = DEFAULT_PACK_STREAMS,
    tokenizer=tokens,
    stream_hash=None,
) -> DataFrame:
    """Length-bucketed batching (r11): assign documents to
    fixed-COUNT batches of SIMILAR token length — the padding-waste
    minimizer for inference/eval/embedding jobs, where a batch pads to
    its longest member (packing minimizes TOKENS per sequence; this
    minimizes PADDING per fixed-size batch — the other half of the
    serving story). Adds ``n_tokens``, ``stream_id``, ``batch_id`` and
    ``batch_max_tokens`` (the batch's padded length — per-row padding
    waste is ``batch_max_tokens - n_tokens``).

    Same determinism/scale shape as :func:`pack_sequences`: documents
    hash into ``n_streams`` content-hash streams (identical on any
    cluster size), each stream sorts by (n_tokens DESC, id ASC) and
    cuts every ``batch_size`` rows — neighbors in the sorted order
    have the closest lengths, so each batch is near-uniform. One
    shuffle + two windows over the stream partitioning. The last batch
    of a stream may be short (< batch_size); ``tokenizer`` as in
    :func:`pack_sequences` (pass ``text_col=ids_col,
    tokenizer=lambda c: F.col(c)`` to budget in token ids)."""
    if batch_size < 1:
        raise ValueError(f"need batch_size >= 1, got {batch_size}")
    if stream_hash is None:
        stream_hash = lambda c: F.xxhash64(F.col(c).cast("string"))  # noqa: E731
    w = Window.partitionBy("stream_id").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    out = (
        df.withColumn("n_tokens", F.size(tokenizer(text_col)).cast("long"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "stream_id",
            F.pmod(stream_hash(id_col), F.lit(n_streams)).cast("int"),
        )
        .withColumn("__rn", F.row_number().over(w) - 1)
        # integer `div`, not `/`+cast: the engine-wide epoch-ns lesson
        .withColumn("batch_id", F.expr(f"__rn div {int(batch_size)}").cast("long"))
        .drop("__rn")
    )
    wb = Window.partitionBy("stream_id", "batch_id")
    return out.withColumn(
        "batch_max_tokens", F.max("n_tokens").over(wb).cast("long")
    )


def pack_offsets(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Adds ``offset``: each document's start-token position within its
    bin — what a training loader needs to pack WITHOUT cross-document
    attention contamination (per-document attention masking / position
    resets inside a packed sequence requires knowing where each
    document starts; packing that skips this silently trains on
    attention across unrelated documents).

    Works on the output of :func:`pack_sequences` AND
    :func:`pack_sequences_bfd`: both place documents within a bin in
    (token count DESC, id ASC) order — the cumsum packer because that
    IS its stream order, BFD because placements follow the globally
    sorted visit order — so the within-bin prior-token sum under that
    order is the placement offset for either. One window over the
    existing (stream_id, bin_id) grain; no extra shuffle beyond the
    window's (which reuses the packing partitioning at scale).
    """
    w = (
        Window.partitionBy("stream_id", "bin_id")
        .orderBy(F.col("n_tokens").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return packed.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )


def bin_manifest(packed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The loader-facing manifest: one row per bin with the ordered
    document list — ``stream_id, bin_id, bin_tokens, docs`` where
    ``docs`` is array<struct<offset, doc_id, n_tokens>> sorted by
    offset (placement order). Built from :func:`pack_offsets`; one
    grouped collect over the bin grain (bounded by the token budget —
    a bin holds at most budget/1 documents)."""
    with_off = pack_offsets(packed, id_col)
    return (
        with_off.groupBy("stream_id", "bin_id")
        .agg(
            F.first("bin_tokens").alias("bin_tokens"),
            F.array_sort(
                F.collect_list(F.struct("offset", F.col(id_col).alias("doc_id"), "n_tokens"))
            ).alias("docs"),
        )
    )


def chunk_documents_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    boundary: str = r"(?<=[.!?])\s+",
    tokenizer=tokens,
    joiner: str = " ",
) -> DataFrame:
    """Sentence-preserving chunking: split each document into sentences
    at ``boundary``, then assign CONSECUTIVE sentences to token-budget
    chunks — the RAG/training split that never cuts mid-sentence
    (mid-sentence cuts hurt both retrieval embeddings and LM training
    targets; :func:`chunk_documents` is the token-exact form when
    sentence integrity doesn't matter).

    Budget semantics match :func:`pack_sequences`'s running-sum
    convention: ``chunk_idx = floor((cumsum - n) / max_tokens)`` over
    sentences in document order, so a chunk overflows only by the
    sentence that crosses its boundary (bounded by the longest
    sentence; a sentence longer than the budget gets a chunk of its
    own). Output: one row per chunk — ``chunk_idx`` (long),
    ``chunk_text`` (sentences re-joined with ``joiner`` — the boundary
    match is CONSUMED by the split, so byte fidelity is not the
    contract, sentence-window fidelity is), ``n_chunk_tokens``,
    ``n_sentences``.

    ``boundary`` is a Java regex (the default uses lookbehind to keep
    terminal punctuation attached); pass an RE2-safe consuming pattern
    (e.g. ``'\\.\\s+'``) when a second engine must reproduce the split
    — the x17 'sent' oracle leg does exactly that.

    Plan: one narrow explode + one per-document window + one grouped
    ordered reassembly — the window partitions by document (bounded by
    per-doc sentence count, never corpus-wide).
    """
    if max_tokens < 1:
        raise ValueError(f"need max_tokens >= 1, got {max_tokens}")
    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), boundary)).alias(
                "sent_idx", "__s"
            ),
        )
        .withColumn("__s", F.trim("__s"))
        .withColumn("__n", F.size(tokenizer(F.col("__s"))).cast("long"))
        .filter(F.col("__n") > 0)
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = exploded.withColumn(
        "chunk_idx",
        F.floor((F.sum("__n").over(w) - F.col("__n")) / F.lit(max_tokens)).cast(
            "long"
        ),
    )
    return (
        chunked.groupBy(id_col, "chunk_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_idx", "__s"))),
                    lambda s: s["__s"],
                ),
                joiner,
            ).alias("chunk_text"),
            F.sum("__n").alias("n_chunk_tokens"),
            F.count(F.lit(1)).alias("n_sentences"),
        )
    )
