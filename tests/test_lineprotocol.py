"""Line-protocol encode/decode round-trips, including the escaping
edge cases the fixture-backed ref_line_protocol query cannot reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.functions.lineprotocol import (
    field_as_boolean,
    field_as_double,
    field_as_long,
    field_as_string,
    parse_line_protocol,
    to_line_protocol,
)


def _roundtrip(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    line = to_line_protocol(
        df, "m", tags=["host", "region"], fields=["fv", "iv", "sv", "bv"],
        time_ns="tns",
    )
    return df.select(line.alias("line")).select(
        F.col("line"), parse_line_protocol(F.col("line")).alias("p")
    )


_SCHEMA = (
    "m string, host string, region string, fv double, iv long, "
    "sv string, bv boolean, tns long"
)


def test_basic_roundtrip(spark):
    out = _roundtrip(
        spark,
        [("cpu", "web1", "us", 0.64, 42, "hi", True, 1700000000000000000)],
        _SCHEMA,
    ).collect()[0]
    assert (
        out["line"]
        == 'cpu,host=web1,region=us fv=0.64,iv=42i,sv="hi",bv=true'
        " 1700000000000000000"
    )
    p = out["p"]
    assert p["measurement"] == "cpu"
    assert p["tags"] == {"host": "web1", "region": "us"}
    assert p["fields"] == {"fv": "0.64", "iv": "42i", "sv": '"hi"', "bv": "true"}
    assert p["time_ns"] == 1700000000000000000


def test_escaping_roundtrip(spark):
    # commas/spaces/equals in measurement+tags, quotes+spaces in strings
    out = _roundtrip(
        spark,
        [
            (
                "cpu load,total",
                "a b",
                "eq=ual",
                1.5,
                7,
                "quoted, and spaced",
                False,
                123,
            )
        ],
        _SCHEMA,
    ).collect()[0]
    p = out["p"]
    assert p["measurement"] == "cpu load,total"
    assert p["tags"] == {"host": "a b", "region": "eq=ual"}
    assert p["time_ns"] == 123


def test_null_tag_and_field_omitted(spark):
    out = _roundtrip(
        spark,
        [("cpu", None, "us", None, 5, None, None, 9)],
        _SCHEMA,
    ).collect()[0]
    assert out["line"] == "cpu,region=us iv=5i 9"
    assert out["p"]["tags"] == {"region": "us"}
    assert out["p"]["fields"] == {"iv": "5i"}


def test_typed_accessors(spark):
    df = spark.createDataFrame(
        [('cpu v=1.25,n=9i,s="x y",b=false 5',)], "line string"
    ).select(parse_line_protocol(F.col("line")).alias("p"))
    row = df.select(
        field_as_double(F.col("p.fields"), "v").alias("v"),
        field_as_long(F.col("p.fields"), "n").alias("n"),
        field_as_string(F.col("p.fields"), "s").alias("s"),
        field_as_boolean(F.col("p.fields"), "b").alias("b"),
    ).collect()[0]
    assert (row["v"], row["n"], row["s"], row["b"]) == (1.25, 9, "x y", False)


def test_no_timestamp_line(spark):
    df = spark.createDataFrame([("cpu,host=a v=1",)], "line string")
    p = df.select(parse_line_protocol(F.col("line")).alias("p")).collect()[0]["p"]
    assert p["measurement"] == "cpu"
    assert p["time_ns"] is None
    assert p["fields"] == {"v": "1"}


def test_whole_stage_codegen_no_python(spark, sf_dir):
    """encode+decode must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython / mapInPandas node anywhere in the plan."""
    from mqtt_influx_storage_service_spark.operators.refsemantics import (
        ref_line_protocol,
    )

    plan = (
        ref_line_protocol(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
