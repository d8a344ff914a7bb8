from .stateful import (
    device_state_stream,
    session_windows,
)
from .ingest import (
    MQTT_SCHEMA,
    apply_cdc,
    bootstrap_registry,
    dedup_messages,
    dispatch,
    mqtt_file_stream,
    parse_service_events,
    start_ingest,
    start_stats,
    stats_messages,
    stop_all,
    throughput_stats,
    to_points,
    wide_view,
)

__all__ = [
    "MQTT_SCHEMA",
    "device_state_stream",
    "session_windows",
    "apply_cdc",
    "bootstrap_registry",
    "dedup_messages",
    "dispatch",
    "mqtt_file_stream",
    "parse_service_events",
    "start_ingest",
    "start_stats",
    "stats_messages",
    "stop_all",
    "throughput_stats",
    "to_points",
    "wide_view",
]
