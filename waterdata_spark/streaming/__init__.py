from waterdata_spark.streaming.gates import (
    bloom_batch,
    bloom_rebuild,
    bloom_stream_sink,
    cms_batch,
    cms_rebuild,
    cms_stream_sink,
    init_bloom_store,
    init_cms_store,
    read_bloom,
    read_cms,
)
from waterdata_spark.streaming.ingest import (
    compact_digests,
    digest_bucket,
    ingest_batch,
    ingest_stream_sink,
    init_ingest,
    read_digests,
)
from waterdata_spark.streaming.neardup import (
    compact_bands,
    flag_near_stored,
    init_neardup,
    neardup_store_batch,
    read_bands,
)
from waterdata_spark.streaming.hygiene import (
    PreparedEvalGrams,
    decontaminate_batch,
    decontaminate_stream_sink,
)
from waterdata_spark.streaming.ops import (
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)

__all__ = [
    "PreparedEvalGrams",
    "bloom_batch",
    "bloom_rebuild",
    "bloom_stream_sink",
    "cms_batch",
    "cms_rebuild",
    "cms_stream_sink",
    "compact_bands",
    "compact_digests",
    "digest_bucket",
    "flag_near_stored",
    "init_neardup",
    "neardup_store_batch",
    "read_bands",
    "decontaminate_batch",
    "decontaminate_stream_sink",
    "hourly_rollup_stream",
    "ingest_batch",
    "ingest_stream_sink",
    "init_ingest",
    "read_digests",
    "init_bloom_store",
    "init_cms_store",
    "read_bloom",
    "read_cms",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
]
