"""Retention-policy enforcement — InfluxDB RP semantics on the
date-partitioned points warehouse.

The reference writes into an InfluxDB database whose retention policy
expires old points by dropping whole *shard groups* (time-partitioned
chunks) once every point in the group is past the policy — an O(1)
metadata delete, never a rewrite. The Spark warehouse already has the
matching layout (``streaming/ingest.py`` partitions points by
``ingest_date``), so enforcement here is the same cheap operation:
delete every ``ingest_date=`` partition directory strictly older than
the cutoff's date. The boundary partition (cutoff falls inside it)
stays until fully expired, exactly like a shard group.

Two layers, mirroring InfluxDB:

- :func:`retention_filter` — the QUERY-TIME view: expired points are
  invisible immediately, even before the enforcement sweep runs. Pure
  predicate → partition pruning + rowgroup pushdown; costs nothing.
- :func:`enforce_retention` — the STORAGE sweep: actually removes
  expired partition directories. Run it periodically (the reference's
  RP enforcement daemon); at 100 TB it touches only directory
  metadata, no data path ever reads the expired bytes.

``now`` is always injectable: deterministic tests, and a batch
campaign can pin one evaluation instant across a whole job.
"""

from __future__ import annotations

import datetime as _dt
import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.influxql import _dur_ns

__all__ = [
    "RetentionPolicy",
    "MetaStore",
    "retention_filter",
    "enforce_retention",
    "go_duration",
    "default_shard_ns",
]

_HOUR_NS = 3_600 * 10**9


def go_duration(ns: int | None) -> str:
    """Format nanoseconds the way InfluxDB prints policy durations (Go
    duration notation: ``720h0m0s``); infinite retention prints ``0s``,
    exactly InfluxDB's SHOW RETENTION POLICIES output."""
    if not ns:
        return "0s"
    s = ns // 1_000_000_000
    h, rem = divmod(s, 3600)
    m, sec = divmod(rem, 60)
    if h:
        return f"{h}h{m}m{sec}s"
    if m:
        return f"{m}m{sec}s"
    return f"{sec}s"


def default_shard_ns(duration_ns: int | None) -> int:
    """InfluxDB's shard-group duration defaults: policies under 2 days
    get 1 h groups, 2 days–6 months get 1 day, longer (or infinite)
    get 7 days. The shard group is the O(1) retention-drop unit — here
    it maps to the warehouse's ``ingest_date=`` partitions."""
    if duration_ns is None:
        return 7 * 24 * _HOUR_NS
    if duration_ns < 2 * 24 * _HOUR_NS:
        return _HOUR_NS
    if duration_ns <= 180 * 24 * _HOUR_NS:
        return 24 * _HOUR_NS
    return 7 * 24 * _HOUR_NS


class RetentionPolicy:
    """A named retention policy: ``duration`` is an InfluxQL duration
    literal (``'30d'``, ``'26w'``) or an integer of nanoseconds;
    ``duration=None`` (or ``'inf'``) means keep forever. ``replication``
    and ``shard_ns`` carry InfluxDB's remaining policy attributes —
    replication is metadata here (Spark's storage layer owns physical
    redundancy), the shard duration feeds SHOW output and documents the
    retention-drop granularity."""

    def __init__(
        self,
        duration: str | int | None,
        name: str = "autogen",
        replication: int = 1,
        shard_ns: int | None = None,
    ):
        self.name = name
        if duration is None or duration == "inf":
            self.duration_ns: int | None = None
        elif isinstance(duration, int):
            self.duration_ns = duration
        else:
            self.duration_ns = _dur_ns(duration)
        self.replication = replication
        self._shard_ns = shard_ns

    @property
    def shard_ns(self) -> int:
        return (
            self._shard_ns
            if self._shard_ns is not None
            else default_shard_ns(self.duration_ns)
        )

    def duration_display(self) -> str:
        return go_duration(self.duration_ns)

    def shard_display(self) -> str:
        return go_duration(self.shard_ns)

    def cutoff(self, now: _dt.datetime) -> _dt.datetime | None:
        if self.duration_ns is None:
            return None
        return now - _dt.timedelta(microseconds=self.duration_ns // 1000)


class MetaStore:
    """Database → retention-policy catalog: the stored management model
    InfluxDB tooling administers with CREATE/ALTER/DROP RETENTION
    POLICY and SHOW DATABASES/RETENTION POLICIES (the reference service
    writes into exactly this model — ``influx_service.py:183-200``
    ensures its database and default policy exist at startup). Pure
    driver-side metadata: dimension-sized, never touches point data —
    enforcement happens through :func:`retention_filter` (query-time)
    and :func:`enforce_retention` (storage sweep) using the policies
    looked up here."""

    def __init__(self):
        self._dbs: dict[str, dict[str, RetentionPolicy]] = {}
        self._default: dict[str, str] = {}
        # db → cq name → full statement text (SHOW CONTINUOUS QUERIES
        # displays the registered statement verbatim, as InfluxDB does)
        self._cqs: dict[str, dict[str, str]] = {}

    # -- databases ---------------------------------------------------------
    def create_database(self, name: str) -> None:
        """Idempotent, like InfluxDB's CREATE DATABASE: a new database
        gets the ``autogen`` infinite-retention default policy."""
        if name in self._dbs:
            return
        self._dbs[name] = {"autogen": RetentionPolicy(None, "autogen")}
        self._default[name] = "autogen"

    def databases(self) -> list[str]:
        return list(self._dbs)

    def drop_database(self, name: str) -> None:
        """DROP DATABASE: remove the catalog entry (policies, default,
        CQ registrations). Metadata only — the warehouse directory is
        the caller's to delete (``influxql_admin`` does it when given
        ``warehouse=``, mirroring InfluxDB's data removal); a missing
        name errors, as InfluxDB's 'database not found'."""
        self._db(name)
        del self._dbs[name]
        self._default.pop(name, None)
        self._cqs.pop(name, None)

    def _db(self, name: str) -> dict[str, RetentionPolicy]:
        if name not in self._dbs:
            raise KeyError(f"database {name!r} does not exist")
        return self._dbs[name]

    # -- policies ----------------------------------------------------------
    def policies(self, db: str) -> list[RetentionPolicy]:
        return list(self._db(db).values())

    def policy(self, db: str, name: str) -> RetentionPolicy:
        pols = self._db(db)
        if name not in pols:
            raise KeyError(f"retention policy {name!r} not found on {db!r}")
        return pols[name]

    def default_policy_name(self, db: str) -> str:
        self._db(db)
        return self._default[db]

    def default_policy(self, db: str) -> RetentionPolicy:
        return self.policy(db, self.default_policy_name(db))

    # -- continuous queries --------------------------------------------------
    def register_cq(self, db: str, name: str, text: str) -> None:
        """CREATE CONTINUOUS QUERY registration — duplicate names fail,
        as InfluxDB's 'continuous query already exists'."""
        self._db(db)
        cqs = self._cqs.setdefault(db, {})
        if name in cqs:
            raise ValueError(f"continuous query {name!r} already exists")
        cqs[name] = text

    def continuous_queries(self, db: str) -> list[tuple[str, str]]:
        """(name, statement text) pairs registered on ``db``, sorted."""
        self._db(db)
        return sorted(self._cqs.get(db, {}).items())

    def drop_cq(self, db: str, name: str) -> None:
        self._db(db)
        if name not in self._cqs.get(db, {}):
            raise KeyError(
                f"continuous query {name!r} not found on {db!r}"
            )
        del self._cqs[db][name]

    def apply_policy_stmt(self, stmt) -> None:
        """Lower a parsed CREATE/ALTER/DROP RETENTION POLICY statement
        (``functions.influxql.RetentionPolicyStmt``) onto the catalog,
        with InfluxDB's error semantics: CREATE of an existing name
        fails, ALTER of a missing name fails, the default policy cannot
        be dropped."""
        pols = self._db(stmt.database)
        if stmt.action == "create":
            if stmt.name in pols:
                raise ValueError(
                    f"retention policy {stmt.name!r} already exists"
                )
            dur = None if stmt.infinite else stmt.duration_ns
            pols[stmt.name] = RetentionPolicy(
                dur,
                stmt.name,
                replication=stmt.replication or 1,
                shard_ns=stmt.shard_ns,
            )
            if stmt.default:
                self._default[stmt.database] = stmt.name
        elif stmt.action == "alter":
            if stmt.name not in pols:
                raise KeyError(
                    f"retention policy {stmt.name!r} not found on "
                    f"{stmt.database!r}"
                )
            p = pols[stmt.name]
            if stmt.infinite:
                p.duration_ns = None
            elif stmt.duration_ns is not None:
                p.duration_ns = stmt.duration_ns
            if stmt.replication is not None:
                p.replication = stmt.replication
            if stmt.shard_ns is not None:
                p._shard_ns = stmt.shard_ns
            if stmt.default:
                self._default[stmt.database] = stmt.name
        elif stmt.action == "drop":
            if stmt.name not in pols:
                raise KeyError(
                    f"retention policy {stmt.name!r} not found on "
                    f"{stmt.database!r}"
                )
            if self._default[stmt.database] == stmt.name:
                raise ValueError(
                    f"cannot drop the default policy {stmt.name!r}"
                )
            del pols[stmt.name]
        else:
            raise ValueError(f"unknown policy action {stmt.action!r}")


_EPOCH = _dt.date(1970, 1, 1)


def shard_group_rows(
    warehouse_dir: str, db: str, policy: RetentionPolicy
) -> list[tuple]:
    """The ``SHOW SHARD GROUPS`` relation over an ``ingest_date=``
    warehouse: partitions grouped into epoch-aligned windows of the
    policy's shard-group duration (InfluxDB's shard-group carving,
    derived from the SAME layout ``enforce_retention`` sweeps). Each
    row is (id, database, retention_policy, start_time, end_time,
    expiry_time) — id is the epoch window ordinal (stable across
    calls), expiry is end + duration, NULL for infinite retention.
    Pure metadata: one directory listing, no data read."""
    shard_days = max(1, policy.shard_ns // (86_400 * 10**9))
    root = Path(warehouse_dir)
    if not root.is_dir():
        raise FileNotFoundError(f"warehouse dir {warehouse_dir} does not exist")
    windows: dict[int, None] = {}
    for child in sorted(root.iterdir()):
        if not child.is_dir() or not child.name.startswith("ingest_date="):
            continue
        try:
            d = _dt.date.fromisoformat(child.name.split("=", 1)[1])
        except ValueError:
            continue
        windows[(d - _EPOCH).days // shard_days] = None
    rows = []
    for idx in sorted(windows):
        start = _dt.datetime.combine(
            _EPOCH + _dt.timedelta(days=idx * shard_days), _dt.time()
        )
        end = start + _dt.timedelta(days=shard_days)
        expiry = (
            None
            if policy.duration_ns is None
            else end + _dt.timedelta(microseconds=policy.duration_ns // 1000)
        )
        rows.append((idx, db, policy.name, start, end, expiry))
    return rows


def drop_shard(
    warehouse_dir: str, policy: RetentionPolicy, shard_id: int
) -> list[str]:
    """``DROP SHARD <id>``: delete every ``ingest_date=`` partition
    inside the shard-group window ``SHOW SHARDS`` lists as that id —
    the manual space-reclaim InfluxDB operators run. Same deletion
    discipline as :func:`enforce_retention` (only directories that
    parse as our date partitions are touched); an id holding no
    partitions errors, as InfluxDB's 'shard not found'."""
    shard_days = max(1, policy.shard_ns // (86_400 * 10**9))
    lo = _EPOCH + _dt.timedelta(days=shard_id * shard_days)
    hi = lo + _dt.timedelta(days=shard_days)
    root = Path(warehouse_dir)
    if not root.is_dir():
        raise FileNotFoundError(f"warehouse dir {warehouse_dir} does not exist")
    removed: list[str] = []
    for child in sorted(root.iterdir()):
        if not child.is_dir() or not child.name.startswith("ingest_date="):
            continue
        try:
            d = _dt.date.fromisoformat(child.name.split("=", 1)[1])
        except ValueError:
            continue
        if lo <= d < hi:
            shutil.rmtree(child)
            removed.append(child.name)
    if not removed:
        raise KeyError(f"shard {shard_id} not found")
    return removed


def retention_filter(
    df: DataFrame,
    policy: RetentionPolicy,
    now: _dt.datetime,
    time_col: str = "ts",
) -> DataFrame:
    """Hide expired points at query time (InfluxDB queries never return
    points past the RP even while their shard group still exists). The
    predicate is a plain literal comparison, so Catalyst pushes it into
    the scan and prunes expired date partitions without listing them.
    """
    cut = policy.cutoff(now)
    if cut is None:
        return df
    bound: Column = F.lit(cut.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp")
    out = df.filter(F.col(time_col) >= bound)
    if "ingest_date" in df.columns:
        # redundant with the ts bound but phrased on the partition
        # column, so pruning works even on sources whose ts stats are
        # absent (e.g. a reader that lost min/max on ts)
        out = out.filter(F.col("ingest_date") >= F.lit(cut.date().isoformat()))
    return out


def enforce_retention(
    warehouse_dir: str,
    policy: RetentionPolicy,
    now: _dt.datetime,
) -> list[str]:
    """Drop every ``ingest_date=`` partition whose whole day lies
    before the cutoff; returns the removed partition names. The
    boundary partition is kept (it still holds unexpired points) —
    :func:`retention_filter` hides its expired rows until the day
    rolls over. Directories that don't parse as date partitions are
    left alone (defensive: never delete what we didn't write).
    """
    cut = policy.cutoff(now)
    if cut is None:
        return []
    cutoff_date = cut.date()
    removed: list[str] = []
    root = Path(warehouse_dir)
    if not root.is_dir():
        raise FileNotFoundError(f"warehouse dir {warehouse_dir} does not exist")
    for child in sorted(root.iterdir()):
        if not child.is_dir() or not child.name.startswith("ingest_date="):
            continue
        try:
            part_date = _dt.date.fromisoformat(child.name.split("=", 1)[1])
        except ValueError:
            continue
        if part_date < cutoff_date:
            shutil.rmtree(child)
            removed.append(child.name)
    return removed
