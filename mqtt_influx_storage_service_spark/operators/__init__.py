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
    # ---- r14 ROTATION (VERDICT r13 "Next round" #2). Slots 1-5: the
    # five rows-only entries whose NEWEST driver row was r1-r3
    # (recomputed from CORRECTNESS_r01..r13 this round — the only
    # registry entries older than r9; rel_range_join's r1 row is the
    # unregistered theta form, superseded by rel_range_join_banded).
    # They can never hash-green (rows-only by structural nature), but
    # ten rounds without driver visibility is the same gap r12 flagged
    # for the never-checked pair, and the judge demanded the slots.
    "dedup_minhash_ml",
    "sim_ann_brp",
    "sim_ann_ivf",
    "sim_ann_ivf_pq",
    "rel_sketches",
    # Slots 6-31: the full r9-stale cohort — every oracle-backed entry
    # whose newest driver-green row is r9 (26 entries, recomputed this
    # round; matches the queue the r13 comment recorded plus
    # rel_set_ops, minus the four dedup entries re-certified in r13).
    "iq_subquery_rollup",
    "iq_top_points",
    "mm_contrastive_pairs",
    "mm_extract_features",
    "mm_frame_sample",
    "mm_manifest",
    "pipeline_epochs",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "pipeline_token_budget",
    "pipeline_training_mix",
    "ref_payload_coercion",
    "ref_registry_filter",
    "ref_topic_parse",
    "rel_merge_join",
    "rel_revenue_threshold",
    "rel_sales_opportunity",
    "rel_set_ops",
    "rel_top_supplier",
    "rel_waiting_supplier",
    "sim_centroid_assign",
    "sim_hybrid_rrf",
    "sim_knn_exact",
    "sim_mmr",
    "sim_range_search",
    "text_langid_ngram",
    # Slots 32-50: the r14-optimization-touched entries NOT already
    # covered by slots 1-31 — every query whose SOURCE (plan) changed
    # in this round's rewrites and is not in the stale-rotation slots
    # above. This is the r10-r13 precedent for touched entries:
    # re-certification insurance after a plan rewrite, even though
    # every one was oracle-checked locally at sf0.01 AND sf0.1 after
    # its change. dedup_semantic's own plan is unchanged but its
    # family's shared persist/release seams were reworked, so it
    # keeps a slot.
    "dedup_components",
    "dedup_semantic",
    "dedup_semantic_ivf",
    "mm_dedup_perceptual",
    "pipeline_dedup_mix",
    "pipeline_domain_quota",
    "pipeline_dsir_resample",
    "pipeline_interleave",
    "pipeline_shuffle_order",
    "rel_excess_supply",
    "rel_min_cost_supplier",
    "rel_small_qty_revenue",
    "rel_supplier_part_types",
    "sim_threshold_pairs",
    "text_bigram_lm",
    "text_bm25",
    "text_dsir_importance",
    "text_repetition",
    "text_tfidf_top",
    # ---- slot 50 boundary. r15 ROTATION QUEUE (front-load next
    # round): the 42 r10-green rows not re-certified here — now the
    # oldest oracle-backed cohort (the 18 alphabetical-head entries
    # this round's touched-set displaced: dedup_substring,
    # dedup_substring_spans, iq_agg_arithmetic .. iq_selector_bare —
    # plus the remaining 23: iq_selector_mixed, iq_slimit,
    # mm_dedup_payload, sim_cosine_topk, sim_knn_graph,
    # sim_label_centroid, sim_label_trimmed_norm, text_boilerplate,
    # text_contamination, text_fingerprint, text_langid, text_quality,
    # text_regex_tokens, text_token_stats, text_word_freq,
    # ts_holt_winters_seasonal, win_cube, win_monthly_revenue,
    # win_ntile_customers, win_percentiles, win_rollup,
    # win_topk_per_group, win_value_frames) — then the r11 cohort as
    # filler. After THIS round no registry entry's newest driver row
    # is older than r9 (the five rows-only entries get r14 rows; the
    # r9 cohort moves to r14; the r14-touched set re-certifies).
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
