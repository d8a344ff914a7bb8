"""Query registry. Each operator module exports ``QUERIES`` (name ->
callable(spark, sf_dir) -> DataFrame) and ``ORACLES`` (name -> DuckDB
SQL); this package merges them for ``__spark_entry__``.

Modules are imported lazily-but-eagerly here; a module that fails to
import should fail loudly (the driver's correctness gate depends on the
full registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    dedup,
    mlops,
    multimodal,
    refsemantics,
    relational,
    similarity,
    textops,
    timeseries,
    windows,
)

_MODULES = [
    timeseries,
    relational,
    windows,
    refsemantics,
    textops,
    dedup,
    similarity,
    multimodal,
    mlops,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {m.__name__}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
