"""Union-type payload coercion (reference: influx_service.py:163-181).

The reference coerces every MQTT payload with parse order float →
boolean → string ("We will only try to parse numbers as floats, since
people and services may flip between integers and floats without
care", influx_service.py:151-161). Parquet has no union type, so the
canonical Spark layout is typed-columns-plus-discriminator
(SURVEY.md §1.4): ``value_type ∈ {float, bool, string}`` with exactly
one of ``value_double`` / ``value_bool`` / ``value_str`` non-null.

Known py3 quirk NOT replicated (SURVEY.md §1.2): the reference compares
``bytes`` payloads against ``str`` literals at influx_service.py:173,176
so its boolean branch never fires in Python 3; we implement the
*intended* semantics and pin both behaviors in tests.

All expressions are built-in (try_cast + when/otherwise) — null-safe
under ANSI mode, fully codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BOOL_TRUE = ["true", "True"]
BOOL_FALSE = ["false", "False"]


def coerce_payload(payload: Column) -> Column:
    """payload string -> struct(value_type, value_double, value_bool, value_str).

    Parse order matches influx_service.py:163-181: float first (so
    "1"/"1.0" both land as float, :166-168), then the four boolean
    literals (:173-178), else string pass-through (:180).
    """
    as_double = payload.try_cast("double")
    is_true = payload.isin(BOOL_TRUE)
    is_false = payload.isin(BOOL_FALSE)
    value_type = (
        F.when(as_double.isNotNull(), F.lit("float"))
        .when(is_true | is_false, F.lit("bool"))
        .otherwise(F.lit("string"))
    )
    return F.struct(
        value_type.alias("value_type"),
        as_double.alias("value_double"),
        F.when(as_double.isNull() & is_true, F.lit(True))
        .when(as_double.isNull() & is_false, F.lit(False))
        .alias("value_bool"),
        F.when(as_double.isNull() & ~is_true & ~is_false, payload).alias("value_str"),
    )


# DuckDB rendering of the identical semantics, for oracle SQL reuse.
# {p} is the payload expression.
COERCE_SQL = """
    CASE WHEN TRY_CAST({p} AS DOUBLE) IS NOT NULL THEN 'float'
         WHEN {p} IN ('true','True','false','False') THEN 'bool'
         ELSE 'string' END AS value_type,
    TRY_CAST({p} AS DOUBLE) AS value_double,
    CASE WHEN TRY_CAST({p} AS DOUBLE) IS NOT NULL THEN NULL
         WHEN {p} IN ('true','True') THEN TRUE
         WHEN {p} IN ('false','False') THEN FALSE END AS value_bool,
    CASE WHEN TRY_CAST({p} AS DOUBLE) IS NULL
          AND {p} NOT IN ('true','True','false','False')
         THEN {p} END AS value_str
"""
