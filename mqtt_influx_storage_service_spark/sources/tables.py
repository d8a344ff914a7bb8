"""Parquet table loaders for the driver fixtures (TESTDATA.md).

All queries go through :func:`load_table` so scan behavior is uniform:
Catalyst pushes predicates & prunes columns into the parquet scan
(verify with ``plans.explain_checks``). At 100 TB the same call reads a
date/device-partitioned parquet/Delta layout — partition pruning comes
from the same declarative filters, no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    """Read one fixture table; applies session tuning on first touch.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) — the reference
    writes at ns precision (``influx_service.py:200``,
    ``time_precision='n'``). Spark's TimestampType is µs, so we read
    nanos as long (``spark.sql.legacy.parquet.nanosAsLong``), keep the
    full-fidelity ``ts_ns`` column (SURVEY.md §1.4), and derive ``ts``
    by exact integer floor-division — the same truncation DuckDB
    applies when it reads ns parquet into its µs TIMESTAMP, so oracle
    comparisons line up bit-for-bit.
    """
    tune(spark)
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    if rebalance:
        # "Small input, expensive map" rebalance: a compact-on-disk table
        # yields few parquet splits, serializing any CPU-heavy projection
        # downstream (shingling, hashing, dot products). Spreading the
        # scan across cluster parallelism before that work is the same
        # move a 1000-executor job makes; cheap queries skip it so their
        # scans stay shuffle-free.
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
