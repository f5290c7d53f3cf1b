from .pipeline import (
    EVENTS_WIRE_SCHEMA,
    events_stream,
    kafka_events_stream,
    parse_kafka_events,
    rate_events_stream,
    run_streaming_dq_gate,
    shape_rate_events,
    streaming_dedup,
    streaming_incident_tracker,
    streaming_session_windows,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)

__all__ = [
    "EVENTS_WIRE_SCHEMA",
    "events_stream",
    "kafka_events_stream",
    "parse_kafka_events",
    "rate_events_stream",
    "shape_rate_events",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_windows",
    "streaming_dedup",
    "streaming_incident_tracker",
    "run_streaming_dq_gate",
]
