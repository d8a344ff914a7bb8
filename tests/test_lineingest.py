"""Streaming line-protocol ingest: encode the fixture events to the
wire format, stream them back in, and prove the round trip lands the
same typed points (plus the malformed-line quarantine split)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.functions.lineprotocol import (
    to_line_protocol,
)
from mqtt_influx_storage_service_spark.sources import load_table
from mqtt_influx_storage_service_spark.streaming.lineingest import (
    start_line_protocol_ingest,
)

SF = "/root/testdata/sf0.001"


def _write_lines(spark, tmp_path):
    ev = load_table(spark, SF, "events").select(
        F.col("event_type").alias("measurement"),
        "user_id",
        "value",
        "ts_ns",
    )
    line = to_line_protocol(
        ev, "measurement", tags=["user_id"], fields=["value"], time_ns="ts_ns"
    )
    src = str(tmp_path / "lines")
    ev.select(line.alias("value")).coalesce(2).write.mode("overwrite").text(src)
    # append a file with malformed garbage lines
    with open(os.path.join(src, "bad.txt"), "w") as fh:
        fh.write("not a line protocol\n\x01\x02 broken =\n")
    return src


def test_line_protocol_ingest_roundtrip(spark, tmp_path):
    src = _write_lines(spark, tmp_path)
    out = str(tmp_path / "out")
    q, qq = start_line_protocol_ingest(
        spark, src, out, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    qq.awaitTermination(120)

    got = spark.read.option("basePath", f"{out}/points").parquet(
        f"{out}/points"
    )
    want = load_table(spark, SF, "events")
    assert got.count() == want.count()
    g = {
        (r["measurement"], r["user_id"], r["ts_ns"]): r["value"]
        for r in got.collect()
    }
    w = {
        (r["event_type"], str(r["user_id"]), r["ts_ns"]): r["value"]
        for r in want.collect()
    }
    assert g == w
    # date partitioning materialized for pruning
    assert any(
        d.startswith("ingest_date=") for d in os.listdir(f"{out}/points")
    )
    quarantined = spark.read.parquet(f"{out}/quarantine").collect()
    assert len(quarantined) >= 1  # the garbage lines landed in quarantine
