from pisa_spark.streaming.analytics import (
    running_topk_thresholds,
    user_sessions,
    windowed_event_volume,
)
from pisa_spark.streaming.incremental import (
    IncrementalIndexer,
    run_stream_indexing,
    stream_pages,
)

__all__ = [
    "IncrementalIndexer",
    "run_stream_indexing",
    "stream_pages",
    "running_topk_thresholds",
    "user_sessions",
    "windowed_event_volume",
]
