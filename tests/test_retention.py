"""Retention-policy enforcement: partition-drop sweep + query-time
filter (InfluxDB RP semantics over the date-partitioned warehouse)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.retention import (
    RetentionPolicy,
    enforce_retention,
    retention_filter,
)

NOW = dt.datetime(2024, 1, 20, 12, 0, 0)


def _warehouse(spark, tmp_path, days):
    wh = str(tmp_path / "warehouse")
    for d in days:
        df = spark.createDataFrame(
            [(d, f"2024-01-{d:02d} 06:00:00")], "day int, ts_s string"
        ).select(
            F.col("day"), F.col("ts_s").cast("timestamp").alias("ts")
        )
        df.write.mode("overwrite").parquet(
            f"{wh}/ingest_date=2024-01-{d:02d}"
        )
    return wh


def test_enforce_drops_only_fully_expired_partitions(spark, tmp_path):
    wh = _warehouse(spark, tmp_path, [1, 5, 10, 15, 19])
    removed = enforce_retention(wh, RetentionPolicy("7d"), now=NOW)
    # cutoff = 2024-01-13 12:00 → partitions with date < 2024-01-13 go
    assert removed == [
        "ingest_date=2024-01-01",
        "ingest_date=2024-01-05",
        "ingest_date=2024-01-10",
    ]
    left = sorted(
        d for d in os.listdir(wh) if d.startswith("ingest_date=")
    )
    assert left == ["ingest_date=2024-01-15", "ingest_date=2024-01-19"]
    # second sweep is a no-op (idempotent)
    assert enforce_retention(wh, RetentionPolicy("7d"), now=NOW) == []


def test_enforce_keeps_boundary_and_foreign_dirs(spark, tmp_path):
    wh = _warehouse(spark, tmp_path, [13])
    os.makedirs(f"{wh}/_spark_metadata")
    os.makedirs(f"{wh}/ingest_date=not-a-date")
    removed = enforce_retention(wh, RetentionPolicy("7d"), now=NOW)
    assert removed == []  # cutoff 01-13 12:00 → the 01-13 partition stays
    assert os.path.isdir(f"{wh}/_spark_metadata")
    assert os.path.isdir(f"{wh}/ingest_date=not-a-date")


def test_enforce_infinite_policy_is_noop(spark, tmp_path):
    wh = _warehouse(spark, tmp_path, [1])
    assert enforce_retention(wh, RetentionPolicy(None), now=NOW) == []
    assert enforce_retention(wh, RetentionPolicy("inf"), now=NOW) == []


def test_enforce_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        enforce_retention(str(tmp_path / "nope"), RetentionPolicy("7d"), NOW)


def test_query_filter_hides_expired_rows_before_sweep(spark, tmp_path):
    wh = _warehouse(spark, tmp_path, [10, 13, 15])
    df = spark.read.option("basePath", wh).parquet(wh)
    vis = retention_filter(df, RetentionPolicy("7d"), now=NOW)
    days = sorted(r["day"] for r in vis.collect())
    # cutoff 2024-01-13 12:00: day-13 06:00 point is expired even though
    # its partition survives the sweep; day-15 remains
    assert days == [15]


def test_query_filter_prunes_partitions(spark, tmp_path):
    wh = _warehouse(spark, tmp_path, [10, 15])
    df = spark.read.option("basePath", wh).parquet(wh)
    vis = retention_filter(df, RetentionPolicy("7d"), now=NOW)
    plan = vis._jdf.queryExecution().executedPlan().toString()
    # the partition predicate must reach the scan (PartitionFilters)
    assert "ingest_date" in plan and "2024-01-13" in plan
