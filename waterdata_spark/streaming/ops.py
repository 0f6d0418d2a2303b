"""Structured Streaming surface (SURVEY.md §2.8).

The reference has no streaming (§2.8: "not present"); this is
north-star surface built on public Structured Streaming APIs. Every
streaming operator here has a batch twin in the oracle suite
(q17_hourly_rollup ↔ hourly_rollup_stream; q19_sessionize ↔
sessionize_stream), so the semantics are cross-checked even though a
stream itself can't be oracle-diffed row-for-row.

Design for scale: watermarks bound state; tumbling windows keyed by
(window, event_type) shuffle once; session windows use Spark's
built-in session_window (state store managed, mergeable sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_stream_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),  # physical layout, probed per path
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-based stream over events parquet (one file = one
    micro-batch unit). In production this is a Kafka source; the
    transformation DAG downstream is identical either way.

    Emits the same columns as schemas.load_table plus ``event_ts``:
    ``ts`` normalized to epoch-ns long (the engine contract) and
    ``event_ts`` a proper TIMESTAMP for watermarks/windows. A stream
    needs a DECLARED schema, so the physical ``ts`` layout is probed
    from the path with one batch-read of the footer and the schema +
    conversion chosen to match — the same three layouts load_table
    supports (nanos-as-long, NTZ, LTZ), all converted timezone-free
    (NTZ epoch literal / unix_micros on instants)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    ns_layout = False
    if isinstance(ts_type, T.TimestampNTZType):
        us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
    elif isinstance(ts_type, T.TimestampType):
        us = F.unix_micros(F.col("ts"))
    else:  # nanos-as-long physical layout: already epoch-ns
        us = F.expr("ts div 1000")
        ns_layout = True
    out = (
        spark.readStream.schema(_events_stream_schema(ts_type))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .withColumn("__us", us)
        .withColumn("event_ts", F.timestamp_micros(F.col("__us")))
    )
    if not ns_layout:
        # timestamp layouts carry at most µs precision — synthesize the
        # epoch-ns contract column. The ns-as-long layout already IS
        # epoch-ns; leave ts untouched so genuinely sub-µs values
        # survive and stream≡batch equality holds on ts (only event_ts
        # is µs-truncated, as any Spark TIMESTAMP must be).
        out = out.withColumn("ts", F.col("__us") * F.lit(1000).cast("long"))
    return out.drop("__us")


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of q17_hourly_rollup: tumbling 1-hour windows,
    late data bounded by the watermark."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user sessions with a built-in session window (gap-merge
    semantics handled by the state store — the scalable form of the
    batch lag/cumsum recipe in q19_sessionize)."""
    return (
        events.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "event_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup (X1's streaming twin): keep the first
    arrival per key, with state bounded by the watermark —
    ``dropDuplicatesWithinWatermark`` evicts a key's state once it is
    older than the watermark, so memory is O(keys per watermark
    window), not O(all keys ever). The batch twin is
    ``operators/dedup.exact_dedup`` / ``dedup_any``; for an at-scale
    corpus the content key should be a sha2 of the payload, exactly
    like the batch path."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    lookback: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each LEFT event pairs with RIGHT
    events of the same user in the trailing ``lookback`` window
    (right.ts ∈ [left.ts - lookback, left.ts]).

    Both sides are watermarked, and the join condition bounds event
    time on both sides — the two conditions Structured Streaming needs
    to know when a buffered row can never match again and evict it, so
    state is O(events per lookback window per side), not unbounded.
    The batch twin is the bucketized range join
    (``operators/range_join``) / q18's as-of shapes.
    """
    lw = left.withWatermark("event_ts", watermark).select(
        F.col(user_col).alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col("event_ts").alias("l_ts"),
    )
    rw = right.withWatermark("event_ts", watermark).select(
        F.col(user_col).alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond).select(
        F.col("l_user").alias(user_col), "l_event_id", "l_ts", "r_event_id", "r_ts", "r_value"
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a bounded file stream to completion synchronously and
    return the materialized result (test/verification harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    cumulative event count + value across micro-batches — state the
    built-in windowed aggregations can't express (it never closes; it
    emits a delta row per user per batch with lifetime totals).

    State is one (count, total) pair per user — bytes per key, safely
    bounded even at billions of users (state store is RocksDB-backed in
    production). The same pattern generalizes to sessionizers, anomaly
    counters, and CDC accumulators.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("batch_events", T.LongType()),
            T.StructField("total_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n_batch = 0
        v_batch = 0.0
        for pdf in pdf_iter:
            n_batch += len(pdf)
            v_batch += float(pdf["value"].fillna(0.0).sum())
        n_prev, v_prev = state.get if state.exists else (0, 0.0)
        state.update((n_prev + n_batch, v_prev + v_batch))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_events": [n_batch],
                "total_events": [n_prev + n_batch],
                "total_value": [round(v_prev + v_batch, 2)],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def near_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "event_ts",
    watermark: str = "2 hours",
    n_hashes: int = 16,
    k: int = 8,
) -> DataFrame:
    """Within-stream NEAR-dup dedup at SIGNATURE granularity: keep the
    first arrival per full-minhash-signature digest, state evicted by
    the watermark. Two documents collide iff all ``n_hashes`` minhash
    values agree — guaranteed for identical shingle SETS (reordered /
    re-wrapped copies of the same content, which exact sha2 dedup
    misses) and probabilistically (~j^n_hashes) for light edits,
    while true LSH banding
    (partial-signature match) stays a batch/ingest-gate concern:
    band-level streaming state would need a doc-level join-back per
    micro-batch that Structured Streaming cannot express without
    arbitrary state, and the signature-digest form keeps the
    ``dropDuplicatesWithinWatermark`` state contract — O(docs per
    watermark window) fixed-width keys, no custom state store.

    The signature is computed per row (column form — one pass, the
    digest immediately collapses it, no per-element re-reference), so
    the stream shuffles one 64-bit-ish digest per document, never
    text. Batch twin: exact_dedup on the same signature column.
    Completes the family: ``dedup_stream`` (exact content),
    ``hygiene.dedup_against_stream_sink`` (near-dup vs a frozen
    reference), this (near-identical within the stream itself)."""
    from waterdata_spark.operators.dedup_approx import minhash_signature

    # null text → all-null signature → concat_ws('') would give every
    # null-text row the SAME digest and silently delete all but the
    # first; null text carries no dedup evidence (the family contract —
    # minhash_signature_frame emits no row for it), so such rows get a
    # per-document unique key and always pass through
    sig = F.when(
        F.col(text_col).isNull(),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    ).otherwise(
        F.sha2(F.concat_ws("|", minhash_signature(F.col(text_col), n_hashes, k)), 256)
    )
    return (
        docs.withColumn("__sig", sig)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__sig"])
        .drop("__sig")
    )


def url_dedup_stream(
    pages: DataFrame,
    id_col: str = "page_id",
    url_col: str = "url",
    ts_col: str = "event_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming crawl-frontier URL dedup: keep the FIRST arrival per
    CANONICAL URL (functions/urls.canonicalize_url — case, default
    ports, fragments, tracking params, param order, trailing slashes
    all collapse), state evicted by the watermark. The fetch-queue
    gate that stops a crawler re-enqueueing the same page under its
    thousand spellings, upstream of every content-level dedup stage.

    Same state contract as :func:`dedup_stream` /
    :func:`near_dedup_stream`: the canonical form reduces to one sha2
    digest per row before the shuffle (fixed-width keys, URLs never
    ride the state store), ``dropDuplicatesWithinWatermark`` bounds
    state to the watermark window. Null URLs carry no identity and
    always pass through (per-row unique key — the family contract).
    Batch twin: ``exact_dedup`` on the canonical-URL column."""
    from waterdata_spark.functions.urls import canonicalize_url

    key = F.when(
        F.col(url_col).isNull(),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    ).otherwise(F.sha2(canonicalize_url(F.col(url_col)), 256))
    return (
        pages.withColumn("__uk", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__uk"])
        .drop("__uk")
    )
