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
    influxqlq,
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
# (50 entries every round so far), so entries WITHOUT a recent green
# row must come first. The r6 rotation (VERDICT r5 "Next round" #1)
# front-loads, in order: (a) the 16 oracle-backed entries added late
# in r5 with no driver row yet (the r5 verdict's queue, verbatim),
# (b) the entries new in r6, (c) the two whose code/hash changed in
# r6, then (e) 23 of the r3-green cohort whose rows are 3 rounds old.
# Everything past slot 50 holds an r3/r4/r5 green row under the
# current fixtures, so union-of-rounds coverage stays complete. Local
# tools/check_oracles.py runs the FULL registry regardless — the
# prefix only bounds what the driver re-certifies per round.
_PRIORITY = [
    # (a) oracle-backed, never driver-checked (the r5 verdict's queued
    # 16 — added late in r5, local-green only until now)
    "iq_bucket_offset",
    "iq_agg_arithmetic",
    "iq_tag_regex",
    "iq_slimit",
    "iq_limit_offset",
    "iq_raw_derivative",
    "iq_raw_running",
    "iq_nonneg_derivative",
    "iq_scalar_math",
    "dedup_threshold_sweep",
    "dedup_containment",
    "mm_dedup_payload",
    "pipeline_temperature_mix",
    "ts_histogram_quantile",
    "ts_burn_rate",
    "ts_availability",
    # (b) new in r6 — raw NON_NEGATIVE_ fix, untagged-series window,
    # long-tail compiler features, perceptual dedup, SemDeDup
    "iq_raw_nonneg",
    "iq_raw_series",
    "iq_selector_mixed",
    "iq_selector_bare",
    "iq_fill_slimit",
    "iq_transform_nested",
    "iq_tz",
    "mm_dedup_perceptual",
    "dedup_semantic",
    # (c) changed in r6: INTEGRAL single-point → 0 on both sides
    # (re-certify the new hash); bucket-transform loop restructured
    # for chains (same values — prove it on the stale transform entry)
    "iq_integral",
    "iq_derivative_daily",
    # (d) no r1-only stragglers remain: the r1 row named
    # "rel_range_join", whose theta form was superseded by the
    # registered rel_range_join_banded (r3-green, queued below)
    # (e) back-fill: the r3-green cohort (rows now 3 rounds old) —
    # Tier A/B reference semantics + the ts_* family first
    "ref_narrow_points",
    "ref_registry_cdc",
    "ref_transducer_create",
    "rel_pricing_summary",
    "rel_shipping_priority",
    "rel_topk_orders",
    "rel_region_revenue",
    "ts_series_scan",
    "ts_device_wide",
    "ts_bucket_agg",
    "ts_last_value",
    "ts_cross_series_join",
    # new late in r6, must be inside the checked prefix
    "pipeline_domain_quota",
    "iq_limit_per_series",
    "iq_raw_grouped",
    "iq_distinct",
    "iq_soffset",
    "dedup_substring",
    "pipeline_shard_plan",
    "rel_small_qty_revenue",
    "dedup_substring_spans",
    "iq_top_tags",
    "text_entropy",
    # ---- slot 50 boundary: everything below overflows the driver's
    # checked prefix. Rows-only-by-nature entries (dedup_minhash_ml,
    # sim_ann_brp/ivf/ivf_pq, rel_sketches) stay out of the prefix: a
    # slot spent on them can never go hash-green.
    #
    # r7 ROTATION QUEUE (front-load next round): ts_gap_fill,
    # ts_interpolate, ts_sliding_agg, ts_moving_avg,
    # ts_registry_enriched, ts_throughput, ts_series_catalog,
    # ts_asof_join (bumped for the late-r6 iq_distinct/iq_soffset/
    # iq_top_tags/dedup_substring[_spans]/pipeline_shard_plan/
    # rel_small_qty_revenue/text_entropy), then the rest of the
    # r3-green cohort — pipeline_interleave, rel_anti_join,
    # rel_distinct_agg, rel_exists_subquery, rel_grouping_sets,
    # rel_interval_overlap, rel_json_extract, rel_map_funcs,
    # rel_outer_join, rel_quantiles, rel_range_join_banded,
    # rel_scalar_funcs, rel_scalar_subquery, rel_semi_join,
    # rel_unpivot, text_repetition, ts_anomaly_zscore, ts_difference, ts_ewma, ts_funnel,
    # ts_histogram, ts_integral, ts_mad_outliers, ts_ohlc,
    # ts_retention, ts_sessionize — then the oldest r4 rows.
    "sim_mmr",
    "dedup_minhash_ml",
    "sim_ann_brp",
    "sim_ann_ivf",
    "sim_ann_ivf_pq",
]

_MODULES = [
    influxqlq,
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
