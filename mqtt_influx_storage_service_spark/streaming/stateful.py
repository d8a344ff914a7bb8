"""Stateful streaming operators beyond tumbling windows (SURVEY.md §2
Tier C streaming row): gap-based session windows and an
``applyInPandasWithState`` custom stateful operator.

The reference keeps exactly two pieces of mutable state — the device
registry dict (influx_service.py:396-401) and the points-written
counter (:205-208, reset by the stats thread :321-322). Both map to
Structured Streaming state primitives; the custom-state operator here
generalizes the counter to per-device running telemetry, the shape any
"last value + running count per key" IoT state takes.

Scale notes: state lives in the state store keyed by device_id —
horizontal partitioning by key is automatic, watermarks bound state
size, and timeouts evict idle devices. That is the 100 TB posture: no
driver-side dict, no unbounded growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.topics import parse_topic


def session_windows(msgs: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per device via ``session_window`` — the
    incremental equivalent of the batch lag+running-sum sessionization
    in operators/timeseries.py (ts_sessionize). Works on a streaming
    OR batch frame; streaming needs the watermark to finalize sessions.
    """
    parsed = parse_topic(F.col("topic"))
    base = msgs.select("ts", parsed.getField("device_id").alias("device_id"))
    if base.isStreaming:
        base = base.withWatermark("ts", gap)
    return (
        base.groupBy(F.session_window("ts", gap).alias("sw"), "device_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(
            "device_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_points",
        )
    )


# output: one row per device per micro-batch with its running totals
DEVICE_STATE_SCHEMA = (
    "device_id string, n_points long, last_ts timestamp, last_payload string"
)
_STATE_SCHEMA = "n_points long, last_ts timestamp, last_payload string"


def _update_device_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-device running count + last-seen message — the reference's
    points counter (:205-208) generalized per key, kept in the state
    store. A real deployment would add anomaly flags / EWMA here; the
    state plumbing is identical."""
    (device_id,) = key
    if state.exists:
        n_points, last_ts, last_payload = state.get
    else:
        n_points, last_ts, last_payload = 0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("ts")
        n_points += len(pdf)
        last_ts = pdf["ts"].iloc[-1]
        last_payload = pdf["payload"].iloc[-1]
    state.update((n_points, last_ts, last_payload))
    yield pd.DataFrame(
        {
            "device_id": [device_id],
            "n_points": [n_points],
            "last_ts": [last_ts],
            "last_payload": [last_payload],
        }
    )


def device_state_stream(msgs: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-device
    running point count + last value across micro-batches."""
    parsed = parse_topic(F.col("topic"))
    keyed = msgs.select(
        parsed.getField("device_id").alias("device_id"), "ts", "payload"
    )
    return keyed.groupBy("device_id").applyInPandasWithState(
        _update_device_state,
        outputStructType=DEVICE_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
