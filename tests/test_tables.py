"""Loader robustness: ``events.ts`` must load whether the fixture writer
encoded it as parquet TIMESTAMP(NANOS) (read as int64 via
``spark.sql.legacy.parquet.nanosAsLong``) or TIMESTAMP(MICROS)
(read as timestamp / timestamp_ntz).

Regression for the round-2 outage: the driver regenerated the fixtures
from int64-ns to timestamp[us] and the loader's unconditional
``ts`` -> ``ts_ns`` rename took down every events-based query
(VERDICT.md r2, "What's wrong" #1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from mqtt_influx_storage_service_spark.sources.tables import load_table

# One row, both encodings, same instant: 2024-01-01T00:00:01.234567890Z
_NS = 1_704_067_201_234_567_890
_US = _NS // 1000

_BASE = {
    "event_id": [1],
    "user_id": [7],
    "event_type": ["click"],
    "value": [1.5],
    "props": ['{"k":1}'],
}


def _write(tmpdir, ts_array) -> str:
    cols = {"event_id": _BASE["event_id"], "ts": ts_array}
    cols.update({k: v for k, v in _BASE.items() if k != "event_id"})
    pq.write_table(pa.table(cols), f"{tmpdir}/events.parquet")
    return str(tmpdir)


@pytest.mark.parametrize(
    "ts_array",
    [
        pytest.param(pa.array([_NS], type=pa.timestamp("ns")), id="int64-nanos"),
        pytest.param(pa.array([_US], type=pa.timestamp("us")), id="timestamp-us"),
        pytest.param(
            pa.array([_US], type=pa.timestamp("us", tz="UTC")), id="timestamp-us-utc"
        ),
    ],
)
def test_events_loader_dtype_adaptive(spark, tmp_path, ts_array):
    df = load_table(spark, _write(tmp_path, ts_array), "events")
    schema = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(schema["ts"], T.TimestampType)
    assert isinstance(schema["ts_ns"], T.LongType)
    row = df.select("ts", "ts_ns").collect()[0]
    # µs fidelity is common to both encodings; ns-encoded keeps full ns.
    assert row["ts_ns"] // 1000 == _US
    expected_ns = _NS if ts_array.type == pa.timestamp("ns") else _US * 1000
    assert row["ts_ns"] == expected_ns
    # ts is the µs truncation of ts_ns in the UTC-pinned session.
    epoch_us = int(row["ts"].timestamp() * 1_000_000)
    # float round-trip of .timestamp() can wobble a µs; compare exactly
    # via Spark instead.
    from pyspark.sql import functions as F

    exact = df.select(
        (F.unix_micros("ts") - F.expr("ts_ns div 1000")).alias("d")
    ).collect()[0]["d"]
    assert exact == 0, (epoch_us, row["ts_ns"])


def test_events_loader_rejects_unknown_encoding(spark, tmp_path):
    bad = dict(_BASE)
    bad["ts"] = ["not-a-time"]
    pq.write_table(pa.table(bad), f"{tmp_path}/events.parquet")
    with pytest.raises(TypeError, match="unsupported dtype"):
        load_table(spark, str(tmp_path), "events")


def test_current_fixtures_load(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert df.limit(1).count() == 1


# ---------------------------------------------------------------------------
# Fixture-staleness guard (ADVICE r4): rel_set_ops / rel_merge_join carry
# r01 driver-green rows on the claim that their TPC-H inputs at the
# driver's correctness SF have never been regenerated. Pin the file
# hashes so that claim is mechanically checked — if the driver ever
# regenerates these fixtures, this fails loudly and the r01 rows must be
# re-certified instead of silently trusted.
# ---------------------------------------------------------------------------

_R01_CERTIFIED_MD5 = {
    "customer.parquet": "fac92fad211c8d3cf65edc988793723d",
    "supplier.parquet": "b862dbc2191d5e6d71a69642049c8504",
    "lineitem.parquet": "8ef7919f18508864bb9873e6c63f3bb9",
    "orders.parquet": "70788a8cef5c555a8d0e669205cfa795",
}


def test_r01_certified_tpch_fixtures_unchanged():
    import hashlib
    import pathlib

    for name, want in _R01_CERTIFIED_MD5.items():
        got = hashlib.md5(
            pathlib.Path("/root/testdata/sf0.01", name).read_bytes()
        ).hexdigest()
        assert got == want, (
            f"{name} changed since the r01 driver certification — "
            "re-certify rel_set_ops/rel_merge_join (rotate them into the "
            "driver-checked registry prefix) before trusting their rows"
        )
