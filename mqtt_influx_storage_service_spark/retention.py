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

__all__ = ["RetentionPolicy", "retention_filter", "enforce_retention"]


class RetentionPolicy:
    """A named retention policy: ``duration`` is an InfluxQL duration
    literal (``'30d'``, ``'26w'``) or an integer of nanoseconds;
    ``duration=None`` (or ``'inf'``) means keep forever."""

    def __init__(self, duration: str | int | None, name: str = "autogen"):
        self.name = name
        if duration is None or duration == "inf":
            self.duration_ns: int | None = None
        elif isinstance(duration, int):
            self.duration_ns = duration
        else:
            self.duration_ns = _dur_ns(duration)

    def cutoff(self, now: _dt.datetime) -> _dt.datetime | None:
        if self.duration_ns is None:
            return None
        return now - _dt.timedelta(microseconds=self.duration_ns // 1000)


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
