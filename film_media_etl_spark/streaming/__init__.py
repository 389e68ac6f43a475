from .windows import (
    read_events_stream,
    stream_session_agg,
    stream_stateful_user_totals,
    stream_tumbling_agg,
    stream_dedup,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_agg",
    "stream_session_agg",
    "stream_dedup",
    "stream_stateful_user_totals",
]
