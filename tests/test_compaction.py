"""Point-data compaction (the streaming sink's small-files problem):
bronze→silver rewrite with per-partition atomic swap, source-set
fingerprint idempotence, and strict no-touch of the sink's
_spark_metadata-governed directory."""

from __future__ import annotations

import os

import pytest

from mqtt_influx_storage_service_spark.tableformat import compact_point_partitions


@pytest.fixture()
def small_file_sink(spark, tmp_path):
    """A sink-shaped source dir: 2 date partitions, many small files."""
    src = tmp_path / "points"
    import pandas as pd

    for d, n_files in (("2024-01-01", 7), ("2024-01-02", 5)):
        part = src / f"ingest_date={d}"
        part.mkdir(parents=True)
        for i in range(n_files):
            pd.DataFrame(
                {
                    "device_id": [f"dev{i}"] * 10,
                    "transducer": ["temp"] * 10,
                    "value_double": [float(j) + i for j in range(10)],
                }
            ).to_parquet(part / f"part-{i:05d}.parquet")
    return str(src)


def _rows(spark, path):
    return sorted(
        map(
            tuple,
            spark.read.option("basePath", path)
            .parquet(path)
            .select("ingest_date", "device_id", "value_double")
            .collect(),
        )
    )


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path, small_file_sink):
    dst = str(tmp_path / "silver")
    stats = compact_point_partitions(spark, small_file_sink, dst)
    assert set(stats) == {"ingest_date=2024-01-01", "ingest_date=2024-01-02"}
    assert all(not s["skipped"] and s["files_out"] == 1 for s in stats.values())
    # identical content, partition column preserved via directory layout
    assert _rows(spark, dst) == _rows(spark, small_file_sink)
    for entry, s in stats.items():
        out_files = [
            f
            for f in os.listdir(os.path.join(dst, entry))
            if f.endswith(".parquet")
        ]
        assert len(out_files) == s["files_out"] < s["files_in"]


def test_compaction_is_idempotent_and_incremental(spark, tmp_path, small_file_sink):
    dst = str(tmp_path / "silver")
    compact_point_partitions(spark, small_file_sink, dst)
    # unchanged source: everything skips
    again = compact_point_partitions(spark, small_file_sink, dst)
    assert all(s["skipped"] for s in again.values())
    # a new micro-batch file lands in ONE partition: only it rewrites
    import pandas as pd

    pd.DataFrame(
        {
            "device_id": ["late"],
            "transducer": ["temp"],
            "value_double": [99.5],
        }
    ).to_parquet(
        os.path.join(small_file_sink, "ingest_date=2024-01-02", "part-late.parquet")
    )
    third = compact_point_partitions(spark, small_file_sink, dst)
    assert third["ingest_date=2024-01-01"]["skipped"]
    assert not third["ingest_date=2024-01-02"]["skipped"]
    assert _rows(spark, dst) == _rows(spark, small_file_sink)


def test_compaction_never_touches_source(spark, tmp_path, small_file_sink):
    before = {
        p: sorted(os.listdir(os.path.join(small_file_sink, p)))
        for p in os.listdir(small_file_sink)
    }
    compact_point_partitions(spark, small_file_sink, str(tmp_path / "silver"))
    after = {
        p: sorted(os.listdir(os.path.join(small_file_sink, p)))
        for p in os.listdir(small_file_sink)
    }
    assert before == after


def test_compaction_respects_target_bytes(spark, tmp_path, small_file_sink):
    dst = str(tmp_path / "silver_tiny")
    stats = compact_point_partitions(
        spark, small_file_sink, dst, target_bytes=2048
    )
    for entry, s in stats.items():
        assert s["files_out"] == max(1, -(-s["bytes"] // 2048))
