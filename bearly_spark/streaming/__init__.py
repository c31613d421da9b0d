"""Structured Streaming view of the events table."""

from bearly_spark.streaming.events import (  # noqa: F401
    events_stream,
    session_window_counts,
    sliding_window_counts,
    stateful_running_max,
    tumbling_window_counts,
)
