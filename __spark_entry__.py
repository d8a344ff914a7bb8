"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's own telemetry
semantics — 10-minute tumbling stats per series, influx_service.py:310-322
— over the ``events`` fixture) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator registry from
``mqtt_influx_storage_service_spark.operators``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mqtt_influx_storage_service_spark.operators import all_oracles, all_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: time-bucketed per-series stats over events at sf0.001."""
    from mqtt_influx_storage_service_spark.operators.timeseries import ts_bucket_agg

    return ts_bucket_agg(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
