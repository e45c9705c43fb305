from hive_similarity_join_spark.streaming.windows import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_aggregates,
    streaming_dedup,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregates",
    "streaming_dedup",
]
