"""Tests for session windows and the applyInPandasWithState custom
stateful operator (streaming/stateful.py)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark import streaming as st


def _write_stream_files(spark, path, batches):
    path.mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "ts string, topic string, payload string")
        df.select(F.col("ts").cast("timestamp"), "topic", "payload").coalesce(
            1
        ).write.mode("overwrite").parquet(str(path / f"stage{i}"))
        for f in (path / f"stage{i}").glob("part-*.parquet"):
            shutil.copy(f, path / f"{i}.parquet")
        shutil.rmtree(path / f"stage{i}")


def test_session_windows_batch_and_stream_agree(spark, tmp_path):
    rows = [
        # device a: two sessions separated by > 30 min
        ("2024-01-01 00:00:00", "openchirp/device/a/t", "1"),
        ("2024-01-01 00:10:00", "openchirp/device/a/t", "2"),
        ("2024-01-01 01:00:00", "openchirp/device/a/t", "3"),
        # device b: one session
        ("2024-01-01 00:05:00", "openchirp/device/b/t", "4"),
    ]
    _write_stream_files(spark, tmp_path / "src", [rows])

    batch = st.session_windows(
        spark.read.schema(st.MQTT_SCHEMA).parquet(str(tmp_path / "src"))
    )
    rows_b = sorted(
        (r["device_id"], r["n_points"]) for r in batch.collect()
    )
    assert rows_b == [("a", 1), ("a", 2), ("b", 1)]

    stream = st.session_windows(st.mqtt_file_stream(spark, str(tmp_path / "src")))
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    # append mode emits only watermark-finalized sessions; every emitted
    # session must exist in the batch result with identical counts
    batch_set = {
        (r["device_id"], r["session_start"], r["n_points"])
        for r in batch.collect()
    }
    for r in got.collect():
        assert (r["device_id"], r["session_start"], r["n_points"]) in batch_set


def test_device_state_accumulates_across_batches(spark, tmp_path):
    b0 = [
        ("2024-01-01 00:00:00", "openchirp/device/a/t", "1"),
        ("2024-01-01 00:01:00", "openchirp/device/a/t", "2"),
        ("2024-01-01 00:00:30", "openchirp/device/b/t", "x"),
    ]
    b1 = [
        ("2024-01-01 00:02:00", "openchirp/device/a/t", "3"),
    ]
    src = tmp_path / "src"
    _write_stream_files(spark, src, [b0, b1])

    stream = st.mqtt_file_stream(spark, str(src), max_files_per_trigger=1)
    out = st.device_state_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("device_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM device_state ORDER BY device_id, n_points"
    ).collect()
    # device a: appears per-batch with cumulative counts ending at 3
    a_counts = [r["n_points"] for r in rows if r["device_id"] == "a"]
    assert a_counts[-1] == 3
    assert any(r["device_id"] == "b" and r["n_points"] == 1 for r in rows)
    last_a = [r for r in rows if r["device_id"] == "a"][-1]
    assert last_a["last_payload"] == "3"
    spark.catalog.dropTempView("device_state")
