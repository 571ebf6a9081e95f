from pisa_spark.streaming.incremental import (
    IncrementalIndexer,
    run_stream_indexing,
    stream_pages,
)

__all__ = ["IncrementalIndexer", "run_stream_indexing", "stream_pages"]
