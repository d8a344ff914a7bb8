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


# -- r7: management DDL → MetaStore ----------------------------------------


def test_go_duration_format():
    from mqtt_influx_storage_service_spark.retention import go_duration

    H = 3_600 * 10**9
    assert go_duration(None) == "0s"
    assert go_duration(0) == "0s"
    assert go_duration(720 * H) == "720h0m0s"
    assert go_duration(90 * 60 * 10**9) == "1h30m0s"
    assert go_duration(45 * 10**9) == "45s"
    assert go_duration(30 * 60 * 10**9) == "30m0s"


def test_default_shard_duration_rules():
    from mqtt_influx_storage_service_spark.retention import default_shard_ns

    H = 3_600 * 10**9
    assert default_shard_ns(None) == 7 * 24 * H           # inf → 7d
    assert default_shard_ns(36 * H) == H                  # <2d → 1h
    assert default_shard_ns(48 * H) == 24 * H             # 2d..6mo → 1d
    assert default_shard_ns(180 * 24 * H) == 24 * H       # boundary
    assert default_shard_ns(181 * 24 * H) == 7 * 24 * H   # >6mo → 7d


def test_metastore_ddl_semantics(spark):
    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql_admin,
    )
    from mqtt_influx_storage_service_spark.retention import MetaStore

    meta = MetaStore()
    influxql_admin(spark, meta, "CREATE DATABASE db1")
    influxql_admin(spark, meta, "CREATE DATABASE db1")  # idempotent
    assert meta.databases() == ["db1"]
    assert meta.default_policy_name("db1") == "autogen"
    assert meta.default_policy("db1").duration_ns is None

    influxql_admin(
        spark, meta,
        "CREATE RETENTION POLICY wk ON db1 DURATION 168h REPLICATION 1 "
        "DEFAULT",
    )
    assert meta.default_policy_name("db1") == "wk"
    # CREATE of an existing policy fails (InfluxDB error semantics)
    with pytest.raises(ValueError, match="already exists"):
        influxql_admin(
            spark, meta,
            "CREATE RETENTION POLICY wk ON db1 DURATION 1h REPLICATION 1",
        )
    # ALTER of a missing policy fails
    with pytest.raises(KeyError, match="not found"):
        influxql_admin(
            spark, meta, "ALTER RETENTION POLICY nope ON db1 DURATION 1h"
        )
    # ALTER back to infinite
    influxql_admin(spark, meta, "ALTER RETENTION POLICY wk ON db1 DURATION INF")
    assert meta.default_policy("db1").duration_ns is None
    # the default policy cannot be dropped
    with pytest.raises(ValueError, match="default"):
        influxql_admin(spark, meta, "DROP RETENTION POLICY wk ON db1")
    influxql_admin(spark, meta, "DROP RETENTION POLICY autogen ON db1")
    assert [p.name for p in meta.policies("db1")] == ["wk"]
    # unknown database
    with pytest.raises(KeyError, match="does not exist"):
        influxql_admin(
            spark, meta, "ALTER RETENTION POLICY wk ON ghost DURATION 1h"
        )
    # CREATE grammar: DURATION and REPLICATION are mandatory
    with pytest.raises(InfluxQLError, match="DURATION"):
        influxql_admin(
            spark, meta, "CREATE RETENTION POLICY x ON db1 REPLICATION 1"
        )
    with pytest.raises(InfluxQLError, match="REPLICATION"):
        influxql_admin(
            spark, meta, "CREATE RETENTION POLICY x ON db1 DURATION 1h"
        )


def test_show_retention_policies_requires_db_when_ambiguous(spark):
    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql_admin,
    )
    from mqtt_influx_storage_service_spark.retention import MetaStore

    meta = MetaStore()
    influxql_admin(spark, meta, "CREATE DATABASE a")
    # single database: ON is optional
    rows = influxql_admin(spark, meta, "SHOW RETENTION POLICIES").collect()
    assert [r.name for r in rows] == ["autogen"]
    assert rows[0].duration == "0s" and rows[0].default
    influxql_admin(spark, meta, "CREATE DATABASE b")
    with pytest.raises(InfluxQLError, match="ON"):
        influxql_admin(spark, meta, "SHOW RETENTION POLICIES")
    dbs = influxql_admin(spark, meta, "SHOW DATABASES").collect()
    assert [r.name for r in dbs] == ["a", "b"]


def test_show_meta_needs_store(spark, sf_dir):
    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql,
    )

    with pytest.raises(InfluxQLError, match="MetaStore"):
        influxql(spark, sf_dir, "SHOW RETENTION POLICIES ON x")


def test_metastore_policy_drives_enforcement(spark, tmp_path):
    """The DDL-built policy plugs straight into the existing sweep:
    CREATE RETENTION POLICY → enforce_retention drops expired
    partitions, same as a hand-built RetentionPolicy."""
    from mqtt_influx_storage_service_spark.functions.influxql import (
        influxql_admin,
    )
    from mqtt_influx_storage_service_spark.retention import MetaStore

    meta = MetaStore()
    influxql_admin(spark, meta, "CREATE DATABASE t")
    influxql_admin(
        spark, meta,
        "CREATE RETENTION POLICY keep2d ON t DURATION 48h REPLICATION 1 "
        "DEFAULT",
    )
    wh = _warehouse(spark, tmp_path, [10, 12, 14])
    removed = enforce_retention(
        wh, meta.default_policy("t"), dt.datetime(2024, 1, 15, 12)
    )
    assert removed == ["ingest_date=2024-01-10", "ingest_date=2024-01-12"]


def test_show_queries_and_kill_query(spark, tmp_path):
    """SHOW QUERIES lists the session's active streaming queries
    (InfluxDB's in-flight-statement view mapped onto spark.streams);
    KILL QUERY stops one by id or name; an unknown qid errors as
    InfluxDB does."""
    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql_admin,
    )

    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .queryName("iq_admin_probe")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        rows = influxql_admin(spark, None, "SHOW QUERIES").collect()
        mine = [r for r in rows if r["query"] == "iq_admin_probe"]
        assert len(mine) == 1 and mine[0]["status"] == "running"
        assert mine[0]["qid"] == str(q.id)
        with pytest.raises(InfluxQLError, match="no such query"):
            influxql_admin(spark, None, "KILL QUERY nope")
        # Spark query ids are UUIDs (contain dashes) — the quoted-
        # identifier form addresses them
        assert influxql_admin(spark, None, f'KILL QUERY "{q.id}"') is None
        q.awaitTermination(60)
        assert not q.isActive
    finally:
        if q.isActive:
            q.stop()


def test_continuous_query_registry(spark):
    """CREATE/DROP CONTINUOUS QUERY register on the MetaStore and SHOW
    CONTINUOUS QUERIES lists the statement text verbatim per database;
    duplicates and unknown names error with InfluxDB's semantics. The
    registered text is runnable by the streaming tier (compile_cq)."""
    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql_admin,
    )
    from mqtt_influx_storage_service_spark.retention import MetaStore
    from mqtt_influx_storage_service_spark.streaming.cq import compile_cq

    meta = MetaStore()
    influxql_admin(spark, meta, "CREATE DATABASE telemetry")
    cq = (
        "CREATE CONTINUOUS QUERY daily ON telemetry "
        "RESAMPLE EVERY 30m FOR 2d BEGIN "
        "SELECT MEAN(value) AS mv FROM click GROUP BY time(1d) END"
    )
    assert influxql_admin(spark, meta, cq) is None
    rows = influxql_admin(spark, meta, "SHOW CONTINUOUS QUERIES").collect()
    assert [(r.database, r.name) for r in rows] == [("telemetry", "daily")]
    assert rows[0].query == cq
    cc = compile_cq(rows[0].query)  # the stored text round-trips
    assert cc.every_us == 30 * 60 * 10**6 and cc.for_us == 2 * 86400 * 10**6
    with pytest.raises(ValueError, match="already exists"):
        influxql_admin(spark, meta, cq)
    with pytest.raises(KeyError, match="not found"):
        influxql_admin(
            spark, meta, "DROP CONTINUOUS QUERY nope ON telemetry"
        )
    influxql_admin(spark, meta, "DROP CONTINUOUS QUERY daily ON telemetry")
    assert (
        influxql_admin(spark, meta, "SHOW CONTINUOUS QUERIES").collect()
        == []
    )


def test_show_shards_and_shard_groups(spark, tmp_path):
    """SHOW SHARD GROUPS carves the ingest_date= layout into
    epoch-aligned windows of the default policy's shard-group duration
    (ids stable, every partition day inside its window); SHOW SHARDS
    is the one-shard-per-group single-node view; a finite-duration
    policy stamps expiry_time = end + duration, infinite stays NULL.
    Pure metadata — no data is read."""
    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql_admin,
    )
    from mqtt_influx_storage_service_spark.retention import MetaStore

    wh = _warehouse(spark, tmp_path, [1, 5, 10, 15, 19])
    meta = MetaStore()
    meta.create_database("t")  # autogen: INF retention, 7d shards
    groups = influxql_admin(
        spark, meta, "SHOW SHARD GROUPS", warehouse=wh
    ).collect()
    assert len(groups) > 1  # the 5 days span several 7d windows
    assert [r.id for r in groups] == sorted({r.id for r in groups})
    for r in groups:
        assert r.retention_policy == "autogen" and r.database == "t"
        assert (r.end_time - r.start_time).days == 7
        assert r.expiry_time is None  # infinite retention
    days = [dt.date(2024, 1, d) for d in (1, 5, 10, 15, 19)]
    for d in days:  # every partition day falls inside some window
        assert any(
            r.start_time.date() <= d < r.end_time.date() for r in groups
        )
    shards = influxql_admin(
        spark, meta, "SHOW SHARDS", warehouse=wh
    ).collect()
    assert [(r.id, r.shard_group) for r in shards] == [
        (g.id, g.id) for g in groups
    ]
    # finite retention: expiry = end + duration
    meta2 = MetaStore()
    meta2.create_database("t")
    influxql_admin(
        spark, meta2,
        "CREATE RETENTION POLICY week ON t DURATION 14d REPLICATION 1 "
        "SHARD DURATION 1d DEFAULT",
    )
    g2 = influxql_admin(
        spark, meta2, "SHOW SHARD GROUPS", warehouse=wh
    ).collect()
    assert len(g2) == 5  # 1d shards: one group per partition day
    for r in g2:
        assert r.expiry_time == r.end_time + dt.timedelta(days=14)
    with pytest.raises(InfluxQLError, match="warehouse"):
        influxql_admin(spark, meta, "SHOW SHARDS")


def test_drop_shard_and_drop_database(spark, tmp_path):
    """DROP SHARD <id> deletes exactly the partitions inside that
    shard-group window (unknown id errors); DROP DATABASE removes the
    catalog entry and, when given the warehouse, the storage — like
    InfluxDB's data removal."""
    import os

    from mqtt_influx_storage_service_spark.functions.influxql import (
        InfluxQLError,
        influxql_admin,
    )
    from mqtt_influx_storage_service_spark.retention import MetaStore

    wh = _warehouse(spark, tmp_path, [1, 5, 10, 15, 19])
    meta = MetaStore()
    meta.create_database("t")
    influxql_admin(
        spark, meta,
        "CREATE RETENTION POLICY daily ON t DURATION 30d REPLICATION 1 "
        "SHARD DURATION 1d DEFAULT",
    )
    shards = influxql_admin(
        spark, meta, "SHOW SHARDS", warehouse=wh
    ).collect()
    victim = shards[0]
    assert victim.start_time.date() == dt.date(2024, 1, 1)
    influxql_admin(
        spark, meta, f"DROP SHARD {victim.id}", warehouse=wh
    )
    assert not os.path.isdir(f"{wh}/ingest_date=2024-01-01")
    assert os.path.isdir(f"{wh}/ingest_date=2024-01-05")
    left = influxql_admin(
        spark, meta, "SHOW SHARDS", warehouse=wh
    ).collect()
    assert [r.id for r in left] == [r.id for r in shards[1:]]
    with pytest.raises(KeyError, match="not found"):
        influxql_admin(
            spark, meta, f"DROP SHARD {victim.id}", warehouse=wh
        )
    # DROP DATABASE: metadata always, storage only with warehouse=
    with pytest.raises(KeyError, match="does not exist"):
        influxql_admin(spark, meta, "DROP DATABASE nope")
    influxql_admin(spark, meta, "DROP DATABASE t", warehouse=wh)
    assert meta.databases() == [] and not os.path.isdir(wh)
    # a dropped-database statement in a read batch still refuses
    from mqtt_influx_storage_service_spark.functions.influxql import (
        influxql,
    )
    with pytest.raises(InfluxQLError, match="management DDL"):
        influxql(spark, str(tmp_path), "DROP SHARD 3")


def test_shard_carving_partitions_exactly_once():
    """Property: for any set of partition dates and any shard duration,
    the carve assigns every date to exactly one listed window, windows
    are disjoint epoch-aligned [start, end) intervals, and ids are the
    epoch ordinals (so they never change as data arrives)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mqtt_influx_storage_service_spark.retention import (
        RetentionPolicy,
        shard_group_rows,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        days=st.sets(
            st.integers(min_value=0, max_value=40_000), min_size=1, max_size=40
        ),
        shard_days=st.integers(min_value=1, max_value=30),
    )
    def check(days, shard_days):
        import tempfile

        pol = RetentionPolicy(None, shard_ns=shard_days * 86_400 * 10**9)
        with tempfile.TemporaryDirectory() as wh:
            dates = []
            for n in days:
                d = dt.date(1970, 1, 1) + dt.timedelta(days=n)
                os.makedirs(f"{wh}/ingest_date={d.isoformat()}")
                dates.append(d)
            rows = shard_group_rows(wh, "t", pol)
        ids = [r[0] for r in rows]
        assert ids == sorted(set(ids))
        for rid, _db, _rp, start, end, expiry in rows:
            assert (start.date() - dt.date(1970, 1, 1)).days == rid * shard_days
            assert (end - start).days == shard_days
            assert expiry is None
        # every date in exactly one window
        for d in dates:
            holders = [
                r for r in rows if r[3].date() <= d < r[4].date()
            ]
            assert len(holders) == 1
        # no empty windows listed
        for r in rows:
            assert any(r[3].date() <= d < r[4].date() for d in dates)

    check()
