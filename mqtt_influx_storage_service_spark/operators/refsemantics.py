"""Tier A reference semantics as oracle-checked batch queries.

Each query reconstructs an MQTT-shaped input from the ``events``
fixture (topic strings, text payloads) and then applies the exact
operator the reference implements — so the driver's DuckDB gate checks
the *semantics* (topic decompose, union-type coercion, narrow layout,
registry membership, CDC last-writer-wins) rather than trusting unit
tests alone. The streaming pipeline in ``streaming/ingest.py`` reuses
the same expression builders from ``functions/``; these batch queries
pin their behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.coercion import COERCE_SQL, coerce_payload
from ..functions.topics import parse_topic
from ..sources import load_table


def _mqtt_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> synthetic MQTT messages.

    topic   = openchirp/device/<user_id>/<UPPER(event_type)>  (mixed
              case so the reference's forced lowercase at
              influx_service.py:139 is actually exercised)
    payload = text payload cycling through the coercion truth table of
              influx_service.py:163-181 (float string, int string, the
              four boolean literals, free text) keyed by event_id so
              the choice is deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    payload = (
        F.when(F.col("event_id") % 6 == 0, F.col("value").cast("string"))
        .when(F.col("event_id") % 6 == 1, (F.col("user_id") * 10).cast("string"))
        .when(F.col("event_id") % 6 == 2, F.lit("true"))
        .when(F.col("event_id") % 6 == 3, F.lit("False"))
        .when(F.col("event_id") % 6 == 4, F.lit("hello world"))
        .otherwise(F.col("props"))
    )
    return ev.select(
        "event_id",
        "ts",
        F.concat(
            F.lit("openchirp/device/"),
            F.col("user_id").cast("string"),
            F.lit("/"),
            F.upper(F.col("event_type")),
        ).alias("topic"),
        payload.alias("payload"),
    )


_MQTT_FRAME_SQL = """
    SELECT event_id, ts,
           'openchirp/device/' || CAST(user_id AS VARCHAR) || '/'
               || upper(event_type) AS topic,
           CASE
             WHEN event_id % 6 = 0 THEN CAST(value AS VARCHAR)
             WHEN event_id % 6 = 1 THEN CAST(user_id * 10 AS VARCHAR)
             WHEN event_id % 6 = 2 THEN 'true'
             WHEN event_id % 6 = 3 THEN 'False'
             WHEN event_id % 6 = 4 THEN 'hello world'
             ELSE props
           END AS payload
    FROM events
"""


# --------------------------------------------------------------------------
# A3 — topic decompose (influx_service.py:129-139)
# --------------------------------------------------------------------------

def ref_topic_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = _mqtt_frame(spark, sf_dir)
    parsed = parse_topic(F.col("topic"))
    return msgs.select(
        "event_id",
        F.col("topic"),
        parsed.getField("device_id").alias("device_id"),
        parsed.getField("transducer").alias("transducer"),
    )


REF_TOPIC_PARSE_SQL = f"""
WITH msgs AS ({_MQTT_FRAME_SQL})
SELECT event_id, topic,
       string_split(topic, '/')[3] AS device_id,
       lower(string_split(topic, '/')[4]) AS transducer
FROM msgs
"""


# --------------------------------------------------------------------------
# A5 — union-type payload coercion (influx_service.py:163-181)
# --------------------------------------------------------------------------

def ref_payload_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = _mqtt_frame(spark, sf_dir)
    c = coerce_payload(F.col("payload"))
    return msgs.select(
        "event_id",
        "payload",
        c.getField("value_type").alias("value_type"),
        c.getField("value_double").alias("value_double"),
        c.getField("value_bool").alias("value_bool"),
        c.getField("value_str").alias("value_str"),
    )


REF_PAYLOAD_COERCION_SQL = f"""
WITH msgs AS ({_MQTT_FRAME_SQL})
SELECT event_id, payload,
{COERCE_SQL.format(p='payload')}
FROM msgs
"""


# --------------------------------------------------------------------------
# A6 — narrow point construction (influx_service.py:183-189)
# --------------------------------------------------------------------------

def ref_narrow_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parse → coerce → narrow-layout pipeline in one query: the
    reference's hot path (SURVEY.md §3.1) as a batch plan."""
    msgs = _mqtt_frame(spark, sf_dir)
    parsed = parse_topic(F.col("topic"))
    c = coerce_payload(F.col("payload"))
    return msgs.select(
        "event_id",
        "ts",
        parsed.getField("device_id").alias("device_id"),
        parsed.getField("transducer").alias("transducer"),
        c.getField("value_type").alias("value_type"),
        c.getField("value_double").alias("value_double"),
    ).select(
        "event_id",
        F.concat_ws("_", F.col("device_id"), F.col("transducer")).alias("series_id"),
        "ts",
        "value_type",
        "value_double",
    )


REF_NARROW_POINTS_SQL = f"""
WITH msgs AS ({_MQTT_FRAME_SQL}),
parsed AS (
    SELECT event_id, ts, payload,
           string_split(topic, '/')[3] AS device_id,
           lower(string_split(topic, '/')[4]) AS transducer
    FROM msgs
)
SELECT event_id,
       device_id || '_' || transducer AS series_id,
       ts,
       CASE WHEN TRY_CAST(payload AS DOUBLE) IS NOT NULL THEN 'float'
            WHEN payload IN ('true','True','false','False') THEN 'bool'
            ELSE 'string' END AS value_type,
       TRY_CAST(payload AS DOUBLE) AS value_double
FROM parsed
"""


# --------------------------------------------------------------------------
# A4 — registry membership semi-join (influx_service.py:133-137)
# --------------------------------------------------------------------------

def ref_registry_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop messages from unregistered devices: the registry here is
    'devices that ever signed up' (derived dimension), broadcast
    left-semi join — the exact Spark shape of the reference's in-dict
    membership check."""
    ev = load_table(spark, sf_dir, "events")
    registry = (
        ev.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("device_id"))
        .distinct()
    )
    kept = ev.join(
        F.broadcast(registry), ev.user_id == registry.device_id, "left_semi"
    )
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


REF_REGISTRY_FILTER_SQL = """
SELECT user_id, count(*) AS n_kept, round(sum(value), 2) AS sum_value
FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events
                  WHERE event_type = 'signup')
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# A10 — registry CDC, last-writer-wins (influx_service.py:324-342)
# --------------------------------------------------------------------------

def ref_registry_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events as CDC records — signup => new/update (device
    present), error => delete (device removed) — and return the final
    registry state: devices whose LAST lifecycle event is a signup,
    exactly the last-writer-wins dict semantics of
    influx_service.py:330-342.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "error")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return last.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("device_id"),
        F.col("ts").alias("registered_ts"),
    )


REF_REGISTRY_CDC_SQL = """
SELECT user_id AS device_id, ts AS registered_ts
FROM (
    SELECT user_id, ts, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type IN ('signup', 'error')
) WHERE rn = 1 AND event_type = 'signup'
"""


# --------------------------------------------------------------------------
# A11 — transducer auto-create (influx_service.py:215-274)
# --------------------------------------------------------------------------

def ref_transducer_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: the reference creates any (device, transducer) pair a data
    message references that the registry doesn't know, exactly once,
    stamped ``created_by`` (influx_service.py:215-274,253).

    Batch form: the known dimension is a deterministic subset of
    observed pairs (event_id % 3 == 0 — the 'bootstrap snapshot');
    unseen pairs anti-join it and collapse to ONE creation row each
    with the earliest observation ts — the same
    dedupe-then-insert-if-absent shape the streaming sink
    (``streaming.ingest.start_transducer_autocreate``) runs per
    micro-batch via insert-only MERGE."""
    msgs = _mqtt_frame(spark, sf_dir)
    parsed = parse_topic(F.col("topic"))
    obs = msgs.select(
        "event_id",
        "ts",
        parsed.getField("device_id").alias("device_id"),
        parsed.getField("transducer").alias("transducer"),
    )
    known = (
        obs.filter(F.col("event_id") % 3 == 0)
        .select("device_id", "transducer")
        .distinct()
    )
    return (
        obs.join(known, ["device_id", "transducer"], "left_anti")
        .groupBy("device_id", "transducer")
        .agg(F.min("ts").alias("created_ts"))
        .withColumn("created_by", F.lit("OpenChirp Influxdb Storage service"))
    )


REF_TRANSDUCER_CREATE_SQL = f"""
WITH msgs AS ({_MQTT_FRAME_SQL}),
obs AS (
    SELECT event_id, ts,
           string_split(topic, '/')[3] AS device_id,
           lower(string_split(topic, '/')[4]) AS transducer
    FROM msgs
),
known AS (
    SELECT DISTINCT device_id, transducer FROM obs WHERE event_id % 3 = 0
)
SELECT o.device_id, o.transducer, min(o.ts) AS created_ts,
       'OpenChirp Influxdb Storage service' AS created_by
FROM obs o
WHERE NOT EXISTS (
    SELECT 1 FROM known k
    WHERE k.device_id = o.device_id AND k.transducer = o.transducer
)
GROUP BY o.device_id, o.transducer
"""


def ref_line_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every event as an InfluxDB line-protocol line (the wire
    format the reference's client emits for the points built at
    ``influx_service.py:183-200``), parse it back with the built-in
    parser, and return the typed columns — a full encode→decode
    round-trip proven lossless against the source table. The whole
    round-trip is one narrow projection (zero Python, zero shuffle):
    at 100 TB a line-protocol export/import rides the scan.
    """
    from ..functions.lineprotocol import (
        field_as_double,
        parse_line_protocol,
        to_line_protocol,
    )

    ev = load_table(spark, sf_dir, "events", rebalance=True).select(
        F.col("event_type").alias("measurement"),
        F.col("user_id"),
        F.col("value"),
        (F.unix_micros(F.col("ts")) * 1000).alias("time_ns"),
    )
    lines = ev.select(
        to_line_protocol(
            ev, "measurement", tags=["user_id"], fields=["value"],
            time_ns="time_ns",
        ).alias("line")
    )
    p = parse_line_protocol(F.col("line")).alias("p")
    return lines.select(p).select(
        F.col("p.measurement").alias("measurement"),
        F.element_at("p.tags", "user_id").alias("user_id"),
        field_as_double(F.col("p.fields"), "value").alias("value"),
        F.col("p.time_ns").alias("time_ns"),
    )


REF_LINE_PROTOCOL_SQL = """
SELECT event_type AS measurement,
       CAST(user_id AS VARCHAR) AS user_id,
       value,
       epoch_us(ts) * 1000 AS time_ns
FROM events
"""


QUERIES = {
    "ref_topic_parse": ref_topic_parse,
    "ref_payload_coercion": ref_payload_coercion,
    "ref_narrow_points": ref_narrow_points,
    "ref_registry_filter": ref_registry_filter,
    "ref_registry_cdc": ref_registry_cdc,
    "ref_transducer_create": ref_transducer_create,
    "ref_line_protocol": ref_line_protocol,
}

ORACLES = {
    "ref_topic_parse": REF_TOPIC_PARSE_SQL,
    "ref_payload_coercion": REF_PAYLOAD_COERCION_SQL,
    "ref_narrow_points": REF_NARROW_POINTS_SQL,
    "ref_registry_filter": REF_REGISTRY_FILTER_SQL,
    "ref_registry_cdc": REF_REGISTRY_CDC_SQL,
    "ref_transducer_create": REF_TRANSDUCER_CREATE_SQL,
    "ref_line_protocol": REF_LINE_PROTOCOL_SQL,
}
