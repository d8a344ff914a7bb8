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
# row must come first. The r11 rotation (VERDICT r10 "Next round" #1)
# front-loads the full r6-stale cohort, then the alphabetical head of
# the r7 cohort up to slot 50. Everything past slot 50 holds an
# r7/r8/r9/r10 green row under the current fixtures, so
# union-of-rounds coverage stays complete. Local
# tools/check_oracles.py runs the FULL registry regardless — the
# prefix only bounds what the driver re-certifies per round.
_PRIORITY = [
    # ---- r12 ROTATION (VERDICT r11 "Next round" #6). Slots 1-3: the
    # entries whose SOURCE changed in r12 (the enforced pair-tier
    # recall contract — above-gate refusal branch in
    # similarity._gemm_threshold_pairs; below-gate fixture plans are
    # byte-identical, so this is re-certification insurance, the r10/
    # r11 precedent for touched entries).
    "sim_threshold_pairs",
    "dedup_embedding_cosine",
    "dedup_threshold_sweep",
    # Slots 4-29: the full r7-stale cohort — every entry whose NEWEST
    # driver-green row is r7 (recomputed this round from
    # CORRECTNESS_r01..r11; matches the queue the r11 comment
    # recorded). After this round NO registry entry's newest driver
    # row is older than r8.
    "rel_promo_revenue",
    "rel_quantiles",
    "rel_range_join_banded",
    "rel_scalar_funcs",
    "rel_scalar_subquery",
    "rel_semi_join",
    "rel_unpivot",
    "text_dsir_importance",
    "text_repetition",
    "ts_anomaly_zscore",
    "ts_asof_join",
    "ts_difference",
    "ts_ewma",
    "ts_funnel",
    "ts_gap_fill",
    "ts_histogram",
    "ts_integral",
    "ts_mad_outliers",
    "ts_moving_avg",
    "ts_ohlc",
    "ts_registry_enriched",
    "ts_retention",
    "ts_series_catalog",
    "ts_sessionize",
    "ts_sliding_agg",
    "ts_throughput",
    # Slots 30-50: r8-cohort filler (alphabetical head of the
    # 47-entry r8-green cohort, now the oldest rows in the registry).
    "dedup_substring_scrub",
    "iq_dema",
    "iq_fill_linear",
    "iq_series_cardinality",
    "iq_show_measurements_where",
    "iq_show_tag_values",
    "iq_tag_values_cardinality",
    "mm_token_budget",
    "pipeline_curriculum",
    "pipeline_dsir_resample",
    "pipeline_funnel",
    "pipeline_quality_gate",
    "pipeline_quality_prune",
    "pipeline_shuffle_order",
    "ref_line_protocol",
    "rel_excess_supply",
    "rel_forecast_revenue",
    "rel_large_orders",
    "rel_market_share",
    "rel_min_cost_supplier",
    "rel_priority_late_orders",
    # ---- slot 50 boundary. r13 ROTATION QUEUE (front-load next
    # round): the remaining 26 r8-green rows —
    # rel_product_profit, rel_returned_customers,
    # rel_supplier_part_types, rel_volume_shipping, text_bigram_lm, text_bm25,
    # text_chunking, text_gopher_rules, text_pii_scrub,
    # ts_changepoint, ts_counter_rate, ts_cross_correlation,
    # ts_cumulative_sum, ts_cumulative_sum_chunked, ts_downsample,
    # ts_elapsed, ts_holt_winters, ts_interpolate, ts_mode,
    # ts_pattern_match, ts_percentile, ts_percentile_twophase,
    # ts_sample, ts_seasonal_profile, ts_spread, ts_top_per_bucket
    # — then r9 rows as filler.
    # Rows-only-by-nature entries (dedup_minhash_ml, sim_ann_brp,
    # sim_ann_ivf, sim_ann_ivf_pq, rel_sketches, dedup_semantic_ivf,
    # pipeline_quality_prune_approx) stay OUT of the prefix: a slot
    # spent on them can never go hash-green.
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
