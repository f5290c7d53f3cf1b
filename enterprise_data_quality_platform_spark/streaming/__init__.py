from .pipeline import (
    events_stream,
    run_streaming_dq_gate,
    streaming_dedup,
    streaming_session_windows,
    streaming_tumbling_counts,
)

__all__ = [
    "events_stream",
    "streaming_tumbling_counts",
    "streaming_session_windows",
    "streaming_dedup",
    "run_streaming_dq_gate",
]
