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
    # ---- r11 ROTATION. Slots 1-2: the entries whose PLAN changed in
    # r11 (the dst-partitioned persisted self-loop relation in
    # _component_labels, VERDICT r10 #4) — output-identical, but the
    # hash must be re-certified under the new plan (r10 precedent).
    "dedup_components",
    "pipeline_dedup_mix",
    # ---- (VERDICT r10 "Next round" #1). Slots 3-27: the
    # full r6-stale cohort — every entry whose NEWEST driver-green row
    # is r6 (recomputed this round from CORRECTNESS_r01..r10; matches
    # the queue VERDICT r10 recorded, plus iq_top_tags which the old
    # comment omitted). After this round NO registry entry's newest
    # driver row is older than r7.
    "iq_soffset",
    "iq_tag_regex",
    "iq_top_tags",
    "iq_transform_nested",
    "iq_tz",
    "pipeline_domain_quota",
    "pipeline_shard_plan",
    "pipeline_temperature_mix",
    "ref_narrow_points",
    "ref_registry_cdc",
    "ref_transducer_create",
    "rel_pricing_summary",
    "rel_region_revenue",
    "rel_shipping_priority",
    "rel_small_qty_revenue",
    "rel_topk_orders",
    "text_entropy",
    "ts_availability",
    "ts_bucket_agg",
    "ts_burn_rate",
    "ts_cross_series_join",
    "ts_device_wide",
    "ts_histogram_quantile",
    "ts_last_value",
    "ts_series_scan",
    # Slots 28-50: r7-cohort filler (alphabetical head of the 49-entry
    # r7-green cohort, now the oldest rows in the registry).
    "iq_cmo",
    "iq_drop_series",
    "iq_ema",
    "iq_ker",
    "iq_math",
    "iq_retention_filter",
    "iq_retention_policies",
    "iq_rsi",
    "iq_show_tag_values_regex",
    "iq_show_tag_values_where",
    "iq_trix",
    "pipeline_interleave",
    "rel_anti_join",
    "rel_customer_orders_dist",
    "rel_disjunctive_revenue",
    "rel_distinct_agg",
    "rel_exists_subquery",
    "rel_grouping_sets",
    "rel_interval_overlap",
    "rel_json_extract",
    "rel_late_lines_priority",
    "rel_map_funcs",
    "rel_outer_join",
    # (rel_range_join's lone r1 row belongs to the RETIRED broadcast-
    # BNLJ form; its successor rel_range_join_banded — identical rows,
    # banded equi-join plan — holds an r7-green row, so nothing stale
    # hides behind the rename.)
    # ---- slot 50 boundary. r12 ROTATION QUEUE (front-load next
    # round): the remaining 26 r7-green rows —
    # rel_promo_revenue, rel_quantiles,
    # rel_range_join_banded, rel_scalar_funcs, rel_scalar_subquery,
    # rel_semi_join, rel_unpivot, text_dsir_importance,
    # text_repetition, ts_anomaly_zscore, ts_asof_join, ts_difference,
    # ts_ewma, ts_funnel, ts_gap_fill, ts_histogram, ts_integral,
    # ts_mad_outliers, ts_moving_avg, ts_ohlc, ts_registry_enriched,
    # ts_retention, ts_series_catalog, ts_sessionize, ts_sliding_agg,
    # ts_throughput — then r8 rows as filler.
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
