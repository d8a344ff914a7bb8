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
    pipeline,
    refsemantics,
    relational,
    similarity,
    textops,
    timeseries,
    windows,
)

# Registration ORDER is load-bearing: the driver's correctness gate
# walks the registry in insertion order and checks a bounded prefix
# (50 entries in r1/r2), so entries WITHOUT a green row under the
# CURRENT fixtures must come first. For r3 that means (VERDICT.md r2,
# "Next round" #2): the 11 r2-err queries, the never-checked
# ts_interpolate, the 17 events-dependent entries whose r1 greens went
# stale when the driver regenerated events.parquet, then the rel_*
# tier (r1-green on unchanged tables, never re-checked in r2), then a
# few rows-only entries touched this round. Everything with a green
# r2 row sorts last — union-of-rounds coverage stays complete.
_PRIORITY = [
    # 11 r2-err (all events-loader casualties, fixed in sources/tables.py)
    "ref_topic_parse",
    "ref_payload_coercion",
    "ref_narrow_points",
    "ref_registry_filter",
    "ref_registry_cdc",
    "ref_transducer_create",
    "ts_anomaly_zscore",
    "ts_retention",
    "ts_series_scan",
    "ts_moving_avg",
    "ts_sliding_agg",
    # never driver-checked (registry slot 55 in r1/r2)
    "ts_interpolate",
    # events-dependent entries with stale r1 greens
    "ts_bucket_agg",
    "ts_last_value",
    "ts_device_wide",
    "ts_asof_join",
    "ts_sessionize",
    "ts_integral",
    "ts_ohlc",
    "ts_funnel",
    "ts_difference",
    "ts_gap_fill",
    "ts_cross_series_join",
    "ts_series_catalog",
    "ts_throughput",
    "ts_registry_enriched",
    "rel_map_funcs",
    "rel_json_extract",
    "rel_sketches",
    # rel tier: r1-green on unchanged tables, not in the r2 prefix
    "rel_pricing_summary",
    "rel_shipping_priority",
    "rel_topk_orders",
    "rel_region_revenue",
    "rel_semi_join",
    "rel_anti_join",
    "rel_outer_join",
    "rel_exists_subquery",
    "rel_quantiles",
    "rel_unpivot",
    "rel_scalar_subquery",
    "rel_range_join_banded",
    "rel_distinct_agg",
    "rel_scalar_funcs",
    "rel_interval_overlap",
    "rel_grouping_sets",
    # new oracle-backed operators added in r3 (no driver row yet)
    "text_repetition",
    "ts_histogram",
    "ts_mad_outliers",
    "pipeline_interleave",
    "ts_ewma",
]

_MODULES = [
    dedup,
    similarity,
    textops,
    multimodal,
    mlops,
    pipeline,
    refsemantics,
    windows,
    timeseries,
    relational,
]


def _reorder(d: dict) -> dict:
    """Priority names first (in _PRIORITY order), the rest in module order.

    A _PRIORITY name absent from the registry (typo, renamed query) must
    fail LOUDLY: silently skipping it would drop the entry out of the
    load-bearing verification prefix — the exact invisible coverage gap
    this reorder exists to prevent (ADVICE r3).
    """
    missing = [k for k in _PRIORITY if k not in d]
    if missing:
        raise KeyError(f"_PRIORITY names not in registry: {missing}")
    out = {k: d[k] for k in _PRIORITY}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {m.__name__}")
        out.update(m.QUERIES)
    return _reorder(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
