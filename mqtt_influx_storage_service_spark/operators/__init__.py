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
    # ---- r13 ROTATION (VERDICT r12 "Next round" #2). Slots 1-5: the
    # entries whose SOURCE changed in r13 (sim_ann_lsh's corpus-scaled
    # geometry; the dedup grid verify — below-gate fixture plans are
    # unchanged for all five, so this is re-certification insurance,
    # the r10-r12 precedent for touched entries).
    "sim_ann_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_containment",
    "dedup_components",
    # Slots 6-31: the full r8-stale cohort — every entry whose NEWEST
    # driver-green row is r8 (recomputed this round from
    # CORRECTNESS_r01..r12; matches the queue the r12 comment
    # recorded). After this round NO oracle-backed entry's newest
    # driver row is older than r9.
    "rel_product_profit",
    "rel_returned_customers",
    "rel_supplier_part_types",
    "rel_volume_shipping",
    "text_bigram_lm",
    "text_bm25",
    "text_chunking",
    "text_gopher_rules",
    "text_pii_scrub",
    "ts_changepoint",
    "ts_counter_rate",
    "ts_cross_correlation",
    "ts_cumulative_sum",
    "ts_cumulative_sum_chunked",
    "ts_downsample",
    "ts_elapsed",
    "ts_holt_winters",
    "ts_interpolate",
    "ts_mode",
    "ts_pattern_match",
    "ts_percentile",
    "ts_percentile_twophase",
    "ts_sample",
    "ts_seasonal_profile",
    "ts_spread",
    "ts_top_per_bucket",
    # Slots 32-33: the ONLY two registry entries never in any driver
    # prefix (VERDICT r12 "What's missing" #3). Rows-only by nature,
    # so the driver records row counts, not hashes — one slot each,
    # once, for driver visibility; they rotate back out next round.
    "dedup_semantic_ivf",
    "pipeline_quality_prune_approx",
    # Slots 34-50: r9-cohort filler (alphabetical head of the r9-green
    # cohort, the oldest oracle-backed rows after this rotation;
    # dedup_minhash_lsh already holds a touched slot above).
    "dedup_exact",
    "dedup_passage",
    "dedup_simhash",
    "emb_quantize_int8",
    "iq_elapsed",
    "iq_fill_previous",
    "iq_holt_winters",
    "iq_holt_winters_seasonal",
    "iq_lineitem_profile",
    "iq_mean_by_day",
    "iq_now_relative",
    "iq_percentile_weekly",
    "iq_raw_select",
    "iq_regex_union",
    "iq_sample",
    "iq_selectors",
    "iq_show_series",
    # ---- slot 50 boundary. r14 ROTATION QUEUE (front-load next
    # round): the remaining 27 r9-green rows —
    # iq_subquery_rollup, iq_top_points, mm_contrastive_pairs,
    # mm_extract_features, mm_frame_sample, mm_manifest,
    # pipeline_epochs, pipeline_pack_sequences,
    # pipeline_stratified_sample, pipeline_token_budget,
    # pipeline_training_mix, ref_payload_coercion, ref_registry_filter,
    # ref_topic_parse, rel_merge_join, rel_revenue_threshold,
    # rel_sales_opportunity, rel_set_ops, rel_top_supplier,
    # rel_waiting_supplier, sim_centroid_assign, sim_hybrid_rrf,
    # sim_knn_exact, sim_mmr, sim_range_search, text_langid_ngram
    # (+ dedup_minhash_lsh/dedup_passage/dedup_simhash/dedup_exact if
    # not re-certified this round) — then r10 rows as filler.
    # Other rows-only-by-nature entries (dedup_minhash_ml, sim_ann_brp,
    # sim_ann_ivf, sim_ann_ivf_pq, rel_sketches) stay OUT of the
    # prefix: a slot spent on them can never go hash-green, and all
    # five already hold driver rows-only rows.
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
