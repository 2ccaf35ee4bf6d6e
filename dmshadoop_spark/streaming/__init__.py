from dmshadoop_spark.streaming.streams import (
    read_events_stream,
    run_foreach_batch_upsert,
    run_to_memory,
    streaming_dedup,
    streaming_dedup_within_watermark,
    streaming_session_counts,
    streaming_sliding_counts,
    streaming_interval_join,
    streaming_stream_static_join,
    streaming_tumbling_counts,
    streaming_user_totals_stateful,
)

__all__ = [
    "read_events_stream",
    "run_foreach_batch_upsert",
    "run_to_memory",
    "streaming_dedup",
    "streaming_dedup_within_watermark",
    "streaming_session_counts",
    "streaming_sliding_counts",
    "streaming_interval_join",
    "streaming_stream_static_join",
    "streaming_tumbling_counts",
    "streaming_user_totals_stateful",
]
