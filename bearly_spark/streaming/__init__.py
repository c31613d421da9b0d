"""Structured Streaming view of the events table."""

from bearly_spark.streaming.events import (  # noqa: F401
    events_stream,
    session_window_counts,
    sliding_window_counts,
    stateful_running_max,
    stateful_user_stats_v2,
    stream_stream_interval_join,
    streaming_dedup,
    tumbling_window_counts,
)
