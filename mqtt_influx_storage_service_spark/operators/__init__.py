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
# row must come first. The r7 rotation (VERDICT r6 "Next round" #1)
# front-loads the r7 queue verbatim: (a) the 8 ts_* entries bumped
# from the r6 prefix by late-r6 additions, (b) the remaining 26
# entries of the r3-green cohort — after this round NO registry
# entry's newest driver row is older than r4 — then (c) entries new
# or hash-changed in r7, and (d) oldest-r4 filler up to slot 50.
# Everything past slot 50 holds an r4/r5/r6 green row under the
# current fixtures, so union-of-rounds coverage stays complete. Local
# tools/check_oracles.py runs the FULL registry regardless — the
# prefix only bounds what the driver re-certifies per round.
_PRIORITY = [
    # (a) bumped from the r6 prefix (r3-green, 3 rounds stale)
    "ts_gap_fill",
    "ts_interpolate",
    "ts_sliding_agg",
    "ts_moving_avg",
    "ts_registry_enriched",
    "ts_throughput",
    "ts_series_catalog",
    "ts_asof_join",
    # (b) the rest of the r3-green cohort (26)
    "pipeline_interleave",
    "rel_anti_join",
    "rel_distinct_agg",
    "rel_exists_subquery",
    "rel_grouping_sets",
    "rel_interval_overlap",
    "rel_json_extract",
    "rel_map_funcs",
    "rel_outer_join",
    "rel_quantiles",
    "rel_range_join_banded",
    "rel_scalar_funcs",
    "rel_scalar_subquery",
    "rel_semi_join",
    "rel_unpivot",
    "text_repetition",
    "ts_anomaly_zscore",
    "ts_difference",
    "ts_ewma",
    "ts_funnel",
    "ts_histogram",
    "ts_integral",
    "ts_mad_outliers",
    "ts_ohlc",
    "ts_retention",
    "ts_sessionize",
    # (c) new/changed in r7 — each insertion popped one filler entry
    # below to hold the 50 boundary
    "iq_retention_policies",
    "iq_drop_series",
    "iq_retention_filter",
    "iq_show_tag_values_regex",
    "iq_show_tag_values_where",
    # (c continued) new in the r7 continuation session: the InfluxQL
    # technical-analysis family + the libm scalar math family (each
    # displaced one plain-filler slot below)
    "iq_math",
    "iq_ema",
    "iq_cmo",
    "iq_rsi",
    "iq_ker",
    "text_dsir_importance",
    "rel_late_lines_priority",
    "rel_customer_orders_dist",
    "rel_promo_revenue",
    "rel_disjunctive_revenue",
    "iq_trix",
    # slot 51+: the new r7 entries that did not fit the 50-slot
    # prefix (23 new entries vs 16 free slots) — iq_dema (the
    # least-machinery TA composition; the 3-stage chain + lag is
    # proven by iq_trix above), pipeline_dsir_resample (keying over
    # the prefix-checked text_dsir_importance), rel_returned_customers
    # and rel_forecast_revenue (exact-integer money ranking /
    # scan-filter shapes), pipeline_shuffle_order, mm_contrastive_pairs,
    # iq_show_measurements_where, and the Q7/Q18 shapes
    # (rel_volume_shipping, rel_large_orders,
    # rel_priority_late_orders, rel_market_share). All locally
    # oracle-green; they
    # FRONT-LOAD the r8 queue. iq_show_tag_values' r7-changed SHOW
    # FROM path is re-proven by the two iq_show_tag_values_* entries
    # above; its own refresh joins the r8 queue with the displaced
    # r4-green filler: sim_mmr, iq_subquery_rollup, iq_now_relative,
    # iq_lineitem_profile, iq_show_series, iq_top_points,
    # iq_raw_select, iq_mean_by_day, iq_selectors,
    # iq_percentile_weekly.
    "iq_dema",
    "pipeline_dsir_resample",
    "rel_returned_customers",
    "rel_forecast_revenue",
    "pipeline_shuffle_order",
    "mm_contrastive_pairs",
    "iq_show_measurements_where",
    "rel_volume_shipping",
    "rel_large_orders",
    "rel_priority_late_orders",
    "rel_market_share",
    "iq_show_tag_values",
    # (slot 51+ continued) the final four TPC-H shapes (Q2/Q9/Q16/Q20,
    # completing the 22-query suite) — locally oracle-green; they join
    # the r8 front-load queue behind the entries above.
    "rel_min_cost_supplier",
    "rel_product_profit",
    "rel_supplier_part_types",
    "rel_excess_supply",
    # (slot 51+ continued) the cardinality family: iq_series_cardinality
    # is hash-CHANGED in late r7 (its statement moved to the EXACT
    # spelling when plain CARDINALITY became InfluxDB's HLL estimate) and
    # iq_tag_values_cardinality is new — both join the r8 front-load
    # queue; the estimate forms are tolerance-tested in pytest, not
    # oracle-hashed (sketches differ across engines by design).
    "iq_series_cardinality",
    "iq_tag_values_cardinality",
    # (slot 51+ continued) new in late r7: DCLM-style per-domain
    # quality-percentile prune, and the Lee-et-al span-REMOVAL pass —
    # r8 front-load queue.
    "pipeline_quality_prune",
    "dedup_substring_scrub",
    "pipeline_funnel",
    # ---- slot 50 boundary: everything below overflows the driver's
    # checked prefix. Rows-only-by-nature entries (dedup_minhash_ml,
    # sim_ann_brp/ivf/ivf_pq, rel_sketches, dedup_semantic_ivf) stay
    # out of the prefix: a slot spent on them can never go hash-green.
    #
    # r8 ROTATION QUEUE (front-load next round): the remaining r4-green
    # rows not re-certified here — text_pii_scrub, text_gopher_rules,
    # text_bigram_lm, text_langid_ngram, text_chunking, text_bm25,
    # mm_token_budget, pipeline_dedup_mix, pipeline_curriculum,
    # pipeline_quality_gate, ref_line_protocol, ts_mode,
    # ts_seasonal_profile, ts_holt_winters, ts_pattern_match,
    # ts_downsample, ts_cross_correlation, ts_cumulative_sum,
    # ts_counter_rate, ts_percentile, ts_spread, ts_elapsed,
    # ts_top_per_bucket, ts_sample, ts_changepoint,
    # rel_waiting_supplier, rel_revenue_threshold,
    # rel_sales_opportunity, rel_top_supplier, sim_centroid_assign,
    # emb_quantize_int8, plus the filler displaced late in r7
    # (sim_mmr, iq_subquery_rollup, iq_now_relative,
    # iq_lineitem_profile, iq_show_series, iq_top_points,
    # iq_raw_select, iq_mean_by_day, iq_selectors,
    # iq_percentile_weekly) — then the oldest r5 rows.
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
