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
    "decontaminate_batch",
    "decontaminate_stream_sink",
    "hourly_rollup_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
]
