from .coercion import coerce_payload
from .topics import is_events_topic, parse_topic

__all__ = ["coerce_payload", "parse_topic", "is_events_topic"]
