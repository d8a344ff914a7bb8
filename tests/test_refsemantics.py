"""Reference-behavior truth tables (SURVEY.md §5 item 2, FIXTURES.md
'Reference-semantics unit fixtures'): payload coercion incl. the py3
bytes-vs-str divergence, topic parsing incl. forced lowercase."""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.functions.coercion import coerce_payload
from mqtt_influx_storage_service_spark.functions.topics import (
    is_events_topic,
    parse_topic,
)

# (payload, value_type, value_double, value_bool, value_str)
# intended semantics of influx_service.py:163-181: float → bool → string
COERCION_TABLE = [
    ("3.14", "float", 3.14, None, None),
    ("7", "float", 7.0, None, None),
    ("-0.5", "float", -0.5, None, None),
    ("1e3", "float", 1000.0, None, None),
    ("true", "bool", None, True, None),
    ("True", "bool", None, True, None),
    ("false", "bool", None, False, None),
    ("False", "bool", None, False, None),
    ("TRUE", "string", None, None, "TRUE"),  # only the 4 exact literals
    ("hello", "string", None, None, "hello"),
    ("", "string", None, None, ""),
    ("nan hi", "string", None, None, "nan hi"),
]


def test_coercion_truth_table(spark):
    df = spark.createDataFrame(
        [(p,) for p, *_ in COERCION_TABLE], ["payload"]
    ).withColumn("c", coerce_payload(F.col("payload")))
    got = {
        r.payload: (r.c.value_type, r.c.value_double, r.c.value_bool, r.c.value_str)
        for r in df.collect()
    }
    for payload, vt, vd, vb, vs in COERCION_TABLE:
        assert got[payload] == (vt, vd, vb, vs), (payload, got[payload])


def test_py3_divergence_documented(spark):
    """The reference compares bytes to str (influx_service.py:173,176)
    so ITS boolean branch never fires in py3 — 'true' would land as
    string there. We implement the intended semantics: pin that our
    engine coerces it to bool (i.e. we deliberately diverge)."""
    df = spark.createDataFrame([("true",)], ["payload"]).withColumn(
        "c", coerce_payload(F.col("payload"))
    )
    assert df.collect()[0].c.value_type == "bool"


def test_topic_parse_lowercases_transducer(spark):
    df = spark.createDataFrame(
        [("openchirp/device/DEV1/TempC",)], ["topic"]
    ).withColumn("p", parse_topic(F.col("topic")))
    row = df.collect()[0]
    assert row.p.device_id == "DEV1"  # device id case preserved
    assert row.p.transducer == "tempc"  # :139 forces lowercase


def test_events_topic_dispatch(spark):
    events_topic = "openchirp/service/svc1/thing/events"
    df = spark.createDataFrame(
        [(events_topic,), ("openchirp/device/d1/t1",)], ["topic"]
    ).withColumn("is_ev", is_events_topic(F.col("topic"), events_topic))
    got = {r.topic: r.is_ev for r in df.collect()}
    assert got[events_topic] is True
    assert got["openchirp/device/d1/t1"] is False
