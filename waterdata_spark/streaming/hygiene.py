"""Streaming corpus hygiene: eval-set decontamination over a document
stream (the ingest-time form of operators/decontaminate.py).

Decontamination is per-document — stateless given a frozen eval set —
so the streaming form needs NO Structured Streaming state: the eval
side (gram hashes + distinct gram lengths) is prepared ONCE at
stream-definition time, and every micro-batch runs the same
broadcast-join flag pass as the batch operator
(``flag_against_prepared``) inside ``foreachBatch``. This is the shape
a 100 TB ingest pipeline runs: benchmark suite frozen at deploy time,
documents flowing, contaminated ones dropped (and optionally
quarantined for audit) before they reach training storage.

The prepared eval side is held as DRIVER-LOCAL rows, not a DataFrame:
eval suites are KB–MB by construction (the same bound that lets the
batch operator broadcast them), and local rows let each micro-batch
rebuild its frame on the batch's own SparkSession — foreachBatch makes
no cross-session guarantees about frames captured from the outside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from waterdata_spark.operators.decontaminate import (
    _eval_gram_hashes,
    flag_against_prepared,
    trimmed_gram_lengths,
)


class PreparedEvalGrams:
    """The frozen eval side: gram-hash rows (pandas, driver-local),
    their schema, and the trimmed distinct gram lengths. Build once
    with :meth:`from_eval_df`; reuse across micro-batches, corpus
    shards, or sessions."""

    def __init__(self, pdf, schema, lengths: list[int]):
        self.pdf = pdf
        self.schema = schema
        self.lengths = lengths

    @classmethod
    def from_eval_df(
        cls,
        eval_df: DataFrame,
        n: int = 13,
        eval_id_col: str = "doc_id",
        eval_text_col: str = "text",
        max_lengths: int = 8,
    ) -> "PreparedEvalGrams":
        e = _eval_gram_hashes(eval_df, eval_id_col, eval_text_col, n)
        lengths = trimmed_gram_lengths(e, max_lengths)
        return cls(e.toPandas(), e.schema, lengths)

    def df(self, spark) -> DataFrame:
        return spark.createDataFrame(self.pdf, schema=self.schema)


def decontaminate_batch(
    batch_df: DataFrame,
    prepared: PreparedEvalGrams,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch's (clean, contaminated) split against the
    prepared eval side — the foreachBatch body, callable directly for
    tests and for batch shard processing."""
    e = prepared.df(batch_df.sparkSession)
    flagged = flag_against_prepared(batch_df, e, prepared.lengths, id_col, text_col).select(
        id_col
    )
    clean = batch_df.join(flagged, id_col, "left_anti")
    dirty = batch_df.join(flagged, id_col, "left_semi")
    return clean, dirty


def decontaminate_stream_sink(
    corpus_stream: DataFrame,
    eval_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    quarantine_dir: str | None = None,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_lengths: int = 8,
):
    """Start an ``availableNow`` foreachBatch query appending CLEAN
    documents to ``out_dir`` (and contaminated ones to
    ``quarantine_dir`` when given — dropped silently otherwise, per the
    GPT-3 recipe). Returns the StreamingQuery (caller awaits
    termination). Stream-vs-batch equality is pinned by
    tests/test_extensions.py::TestStreamingDecontaminate."""
    prepared = PreparedEvalGrams.from_eval_df(
        eval_df, n=n, eval_id_col=id_col, eval_text_col=text_col, max_lengths=max_lengths
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        clean, dirty = decontaminate_batch(batch_df, prepared, id_col, text_col)
        clean.write.mode("append").parquet(out_dir)
        if quarantine_dir:
            dirty.write.mode("append").parquet(quarantine_dir)

    return (
        corpus_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


class PreparedReferenceSignatures:
    """The frozen reference side of the streaming NEAR-DUP ingest gate:
    minhash signatures as driver-local rows (n_hashes fixed-width
    values per reference doc — the text never leaves the batch job
    that built them). Build once with :meth:`from_reference_df`; reuse
    across micro-batches and sessions. Bound: a reference that fits
    the batch operator's broadcast (the decision join broadcasts it
    anyway) fits here; beyond that, run batch ``dedup_against``.

    Scope note (r12): this gate's reference is FROZEN at build time —
    right for "never near-duplicate THIS fixed corpus" (an eval set, a
    licensed collection). To near-dup a stream against EVERYTHING
    ALREADY INGESTED — the reference grows with every batch — use the
    stream-MAINTAINED band store (``streaming/neardup.py``, composed
    into the live release by ``ingest_batch(neardup_dir=...)``), which
    also runs the full exact-verify cascade instead of this gate's
    signature-only decision."""

    def __init__(self, pdf, schema, n_hashes: int, n_bands: int, k: int, hash_fn: str):
        self.pdf = pdf
        self.schema = schema
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.k = k
        self.hash_fn = hash_fn

    @classmethod
    def from_reference_df(
        cls,
        reference: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_hashes: int = 16,
        n_bands: int = 4,
        k: int = 8,
        hash_fn: str = "xx",
    ) -> "PreparedReferenceSignatures":
        from waterdata_spark.operators.dedup_approx import reference_signatures

        sig = reference_signatures(reference, id_col, text_col, n_hashes, k, hash_fn)
        return cls(sig.toPandas(), sig.schema, n_hashes, n_bands, k, hash_fn)

    def df(self, spark) -> DataFrame:
        return spark.createDataFrame(self.pdf, schema=self.schema)


def dedup_against_batch(
    batch_df: DataFrame,
    prepared: PreparedReferenceSignatures,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch's (kept, dropped) split against the prepared
    reference signatures — the foreachBatch body, callable directly
    for tests and batch shards. Decision = band collision AND
    signature estimate >= threshold (``flag_near_reference``), exactly
    the batch twin's rule, so stream == batch row-for-row."""
    from waterdata_spark.operators.dedup_approx import flag_near_reference

    flagged = flag_near_reference(
        batch_df,
        prepared.df(batch_df.sparkSession),
        id_col,
        text_col,
        prepared.n_hashes,
        prepared.n_bands,
        prepared.k,
        threshold,
        prepared.hash_fn,
    )
    kept = batch_df.join(flagged, id_col, "left_anti")
    dropped = batch_df.join(flagged, id_col, "left_semi")
    return kept, dropped


def dedup_against_stream_sink(
    corpus_stream: DataFrame,
    reference: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    quarantine_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 8,
    threshold: float = 0.7,
    hash_fn: str = "xx",
):
    """Streaming cross-corpus NEAR-dup ingest gate: documents flow in,
    anything near-duplicating the frozen reference corpus (band
    collision + MinHash estimate >= threshold) is dropped (or
    quarantined) before reaching training storage — the ingest-time
    form of ``dedup_approx.dedup_against``, decided from signatures
    alone so the reference text is never shipped or re-scanned.
    Stateless per document given the frozen reference: no Structured
    Streaming state, every micro-batch runs the same broadcast
    decision join. Returns the availableNow StreamingQuery."""
    prepared = PreparedReferenceSignatures.from_reference_df(
        reference, id_col, text_col, n_hashes, n_bands, k, hash_fn
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        kept, dropped = dedup_against_batch(
            batch_df, prepared, id_col, text_col, threshold
        )
        kept.write.mode("append").parquet(out_dir)
        if quarantine_dir:
            dropped.write.mode("append").parquet(quarantine_dir)

    return (
        corpus_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming perplexity-gated ingestion (r10) — CCNet's quality score
# applied at ingest time: the reference LM is fit ONCE at stream-definition
# time (selection.fit_lm_tables → driver-local rows, the same KB-MB bound
# that lets the batch operator broadcast its model tables), and every
# micro-batch is scored statelessly with selection.score_lm (pinned exactly
# equal to lm_perplexity) and split at a log-perplexity threshold. No
# Structured Streaming state — the same family shape as the decontaminate
# and near-dup gates above.
# ---------------------------------------------------------------------------


def ppl_gate_batch(
    batch_df: DataFrame,
    tables,
    max_log_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_unscored: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch's (kept, rejected) split at ``max_log_ppl``
    under frozen :class:`~waterdata_spark.operators.selection.LmTables`
    — the foreachBatch body, callable directly for tests and shard
    processing. Documents with no bigram evidence (<2 tokens) score
    null and are REJECTED by default (``keep_unscored=True`` keeps
    them — both are defensible; CCNet buckets only scored docs)."""
    from pyspark.sql import functions as F

    from waterdata_spark.operators.selection import score_lm

    scored = score_lm(batch_df, tables, id_col=id_col, text_col=text_col)
    ok = F.col("log_ppl") <= F.lit(max_log_ppl)
    if keep_unscored:
        ok = ok | F.col("log_ppl").isNull()
    kept = scored.filter(ok).drop("log_ppl")
    rejected = scored.filter(~F.coalesce(ok, F.lit(False))).drop("log_ppl")
    return kept, rejected


def ppl_gate_stream_sink(
    corpus_stream: DataFrame,
    reference: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_log_ppl: float,
    quarantine_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_unscored: bool = False,
    **lm_kwargs,
):
    """Start an ``availableNow`` foreachBatch query appending documents
    whose log perplexity under the ``reference``-trained LM is ≤
    ``max_log_ppl`` to ``out_dir`` (rejects to ``quarantine_dir`` when
    given). ``lm_kwargs`` pass to fit_lm_tables (n_buckets, alpha,
    interp, hash_fn, smoothing='jm'|'kn'). Returns the StreamingQuery.
    Stream-vs-batch equality is pinned by
    tests/test_extensions.py::TestStreamingPplGate."""
    from waterdata_spark.operators.selection import fit_lm_tables

    tables = fit_lm_tables(reference, text_col=text_col, **lm_kwargs)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        kept, rejected = ppl_gate_batch(
            batch_df, tables, max_log_ppl, id_col, text_col, keep_unscored
        )
        kept.write.mode("append").parquet(out_dir)
        if quarantine_dir:
            rejected.write.mode("append").parquet(quarantine_dir)

    return (
        corpus_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
