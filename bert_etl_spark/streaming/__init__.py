from bert_etl_spark.streaming.events import (
    EVENTS_SCHEMA_TEMPLATE,
    enrich_with_dim,
    events_stream,
    run_to_memory,
    session_windows,
    stateful_running_counts,
    stream_dedup,
    stream_stream_join,
    tumbling_counts,
    write_stream_parquet,
)

__all__ = [
    "EVENTS_SCHEMA_TEMPLATE",
    "events_stream",
    "tumbling_counts",
    "stream_dedup",
    "stream_stream_join",
    "enrich_with_dim",
    "run_to_memory",
    "session_windows",
    "stateful_running_counts",
    "write_stream_parquet",
]
