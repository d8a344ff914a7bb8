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
    # ---- r10 ROTATION (VERDICT r9 "Next round" #1-2). Slots 1-4: the
    # entries whose PLAN changed in r10 (the rescue tier in
    # _shingle_candidates under _jaccard_pairs/dedup_containment/
    # dedup_components, inherited by pipeline_dedup_mix) —
    # output-identical at fixture scale (no over-cap shingles, the
    # precondition check_oracles now ASSERTS) but the hash must be
    # re-certified under the new plan.
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_containment",
    "pipeline_dedup_mix",
    # the full r5-green cohort (22 entries, VERDICT r9 #2's list):
    # after this round NO entry's newest driver row is older than r6.
    "sim_ann_lsh",
    "sim_cosine_topk",
    "sim_knn_graph",
    "sim_label_centroid",
    "sim_label_trimmed_norm",
    "text_boilerplate",
    "text_contamination",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_regex_tokens",
    "text_tfidf_top",
    "text_token_stats",
    "text_word_freq",
    "ts_holt_winters_seasonal",
    "win_cube",
    "win_monthly_revenue",
    "win_ntile_customers",
    "win_percentiles",
    "win_rollup",
    "win_topk_per_group",
    "win_value_frames",
    # r6-cohort filler to the 50-slot boundary: first the six entries
    # adjacent to this round's dedup-tier changes, then alphabetical.
    "dedup_semantic",
    "dedup_substring",
    "dedup_substring_spans",
    "dedup_threshold_sweep",
    "mm_dedup_payload",
    "mm_dedup_perceptual",
    "iq_agg_arithmetic",
    "iq_bucket_offset",
    "iq_derivative_daily",
    "iq_distinct",
    "iq_fill_slimit",
    "iq_integral",
    "iq_limit_offset",
    "iq_limit_per_series",
    "iq_nonneg_derivative",
    "iq_raw_derivative",
    "iq_raw_grouped",
    "iq_raw_nonneg",
    "iq_raw_running",
    "iq_raw_series",
    "iq_scalar_math",
    "iq_selector_bare",
    "iq_selector_mixed",
    "iq_slimit",
    # (rel_range_join's lone r1 row belongs to the RETIRED broadcast-
    # BNLJ form; its successor rel_range_join_banded — identical rows,
    # banded equi-join plan — holds an r7-green row, so nothing stale
    # hides behind the rename.)
    # ---- slot 50 boundary. r11 ROTATION QUEUE (front-load next
    # round): the remaining r6-green rows —
    # iq_soffset, iq_tag_regex, iq_transform_nested, iq_tz, pipeline_domain_quota, pipeline_shard_plan,
    # pipeline_temperature_mix, ref_narrow_points, ref_registry_cdc,
    # ref_transducer_create, rel_pricing_summary, rel_region_revenue,
    # rel_shipping_priority, rel_small_qty_revenue, rel_topk_orders,
    # text_entropy, ts_availability, ts_bucket_agg, ts_burn_rate,
    # ts_cross_series_join, ts_device_wide, ts_histogram_quantile,
    # ts_last_value, ts_series_scan — then r7 rows as filler.
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
