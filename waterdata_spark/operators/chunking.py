"""Training-data shaping: token-bounded document chunking and
fixed-budget sequence packing (LLM-pipeline surface beyond the
reference's own operators; companion to functions/text.py X4).

Both operators are pure JVM expression pipelines — sequence/slice/
explode/window — no Python UDFs, so they scale like any other
aggregation: one narrow pass for chunking, one bounded shuffle for
packing.
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


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 512,
    n_streams: int | None = None,
    tokenizer=tokens,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence
    (bin): output adds ``stream_id``, ``bin_id``, ``bin_tokens``.

    Distributed sequential packing — the standard scale approximation
    of bin packing: documents are hash-partitioned into ``n_streams``
    independent streams (default: 2× shuffle parallelism), each stream
    orders its documents deterministically (token count DESC, id ASC —
    first-fit-decreasing order) and fills bins by running token count:
    ``bin_id = floor((cumsum - n_tokens) / budget)``. Each bin's
    content is deterministic under any cluster size because streams
    are content-hash partitions, not task partitions.

    Waste bound: a bin overflows only by the document that crosses the
    boundary, so per-bin padding waste is < max_doc_tokens/budget of
    the budget; documents longer than the budget get a bin of their
    own (callers chunk first — see :func:`chunk_documents`).

    Plan shape: one shuffle (hash repartition on the stream), one
    window per stream — no global sort, no driver state. The exact
    first-fit-decreasing packing is inherently sequential; this is the
    scalable form used by large training-data pipelines.
    """
    n_streams = n_streams or df.sparkSession.sparkContext.defaultParallelism * 2
    w = Window.partitionBy("stream_id").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    out = (
        df.withColumn("n_tokens", F.size(tokenizer(text_col)).cast("long"))
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "stream_id",
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_streams)).cast("int"),
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(budget_tokens)).cast("long"),
        )
    )
    bin_tot = Window.partitionBy("stream_id", "bin_id")
    return out.withColumn("bin_tokens", F.sum("n_tokens").over(bin_tot)).drop("__cum")
