"""MQTT topic parsing (reference: influx_service.py:125-139).

Topic grammar: ``openchirp/device/<device_id>/<transducer>`` — the
topic IS the key: ``words[2]`` (0-based) is the device id, ``words[3]``
lowercased is the transducer name (the forced ``.lower()`` at
influx_service.py:139). Messages on the service-events topic
(``openchirp/service/<id>/thing/events``) dispatch to the registry-CDC
path instead (influx_service.py:125-127).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATA_TOPIC_PREFIX = "openchirp/device/"


def parse_topic(topic: Column) -> Column:
    """topic string -> struct(device_id, transducer).

    1-based ``try_element_at``: element 3 = device, element 4 =
    transducer (lowercased, influx_service.py:139). ``try_`` matters:
    under Spark 4's default ANSI mode a plain ``element_at`` THROWS
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT for topics with fewer than 4
    segments — in a streaming micro-batch that one malformed message
    fails the batch, and checkpoint replay turns it into a permanent
    poison pill. The reference survives the same case via its
    try/except (influx_service.py:114-119, operator A16); declaratively
    a short topic must yield NULL fields that the quarantine split
    (``streaming.ingest.split_malformed``) routes to the dead letter.
    """
    parts = F.split(topic, "/")
    return F.struct(
        F.try_element_at(parts, F.lit(3)).alias("device_id"),
        F.lower(F.try_element_at(parts, F.lit(4))).alias("transducer"),
    )


def is_events_topic(topic: Column, events_topic: str) -> Column:
    """Dispatch predicate (influx_service.py:125-127): exact match on
    the service events topic routes to the CDC branch."""
    return topic == F.lit(events_topic)
