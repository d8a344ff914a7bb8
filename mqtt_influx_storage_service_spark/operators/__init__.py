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
    # ---- r9 ROTATION (VERDICT r8 "Next round" #1-2). Slots 1-7: the
    # entries whose PLAN changed in r9 (the SHINGLE_DF_CAP candidate
    # stage under _jaccard_pairs/dedup_containment and the labels
    # subtree that inherits it) — output-identical at fixture scale
    # (max shingle df 7/25 vs cap 64; re-verified locally at sf0.01
    # AND sf0.1) but the hash must be re-certified under the new plan,
    # exactly like ts_holt_winters in r8.
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_containment",
    "pipeline_training_mix",
    "pipeline_token_budget",
    "pipeline_epochs",
    "pipeline_dedup_mix",
    # late-r9 broadcast-census fixes (corpus-sized static broadcasts
    # pinned to shuffle-hash) — plans changed, so their newest driver
    # rows (r8/r5) predate the plan; re-certify:
    "text_langid_ngram",
    "mm_contrastive_pairs",
    "sim_threshold_pairs",
    # the full r4-green cohort (21 entries; the r8 comment queued 16 —
    # the other 5 r4 rows are iq_fill_previous, iq_regex_union,
    # sim_hybrid_rrf, sim_knn_exact, sim_range_search): after this
    # round NO entry's newest driver row is older than r5.
    "emb_quantize_int8",
    "iq_fill_previous",
    "iq_lineitem_profile",
    "iq_mean_by_day",
    "iq_now_relative",
    "iq_percentile_weekly",
    "iq_raw_select",
    "iq_regex_union",
    "iq_selectors",
    "iq_show_series",
    "iq_subquery_rollup",
    "iq_top_points",
    "rel_revenue_threshold",
    "rel_sales_opportunity",
    "rel_top_supplier",
    "rel_waiting_supplier",
    "sim_centroid_assign",
    "sim_hybrid_rrf",
    "sim_knn_exact",
    "sim_mmr",
    "sim_range_search",
    # oldest-r5 filler (alphabetical; 22 of the 42-strong r5 cohort)
    # up to the 50-slot boundary.
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_passage",
    "dedup_simhash",
    "iq_elapsed",
    "iq_holt_winters",
    "iq_holt_winters_seasonal",
    "iq_sample",
    "mm_extract_features",
    "mm_frame_sample",
    "mm_manifest",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "ref_payload_coercion",
    "ref_registry_filter",
    "ref_topic_parse",
    "rel_merge_join",
    "rel_set_ops",
    # (sim_ann_lsh / sim_cosine_topk / sim_knn_graph were the last
    # three r5 fillers here; displaced to the r10 queue by the three
    # census-fix entries above — they hold r5-green rows, so the
    # "no entry older than r5" goal is unaffected)
    # ---- slot 50 boundary. r10 ROTATION QUEUE (front-load next
    # round): sim_ann_lsh, sim_cosine_topk, sim_knn_graph, then the
    # remaining 20 r5-green entries —
    # sim_label_centroid, sim_label_trimmed_norm, sim_threshold_pairs, text_boilerplate,
    # text_contamination, text_fingerprint, text_langid, text_quality,
    # text_regex_tokens, text_tfidf_top, text_token_stats, text_word_freq,
    # ts_holt_winters_seasonal, win_cube, win_monthly_revenue, win_ntile_customers,
    # win_percentiles, win_rollup, win_topk_per_group, win_value_frames
    # — then the oldest remaining r6 rows as filler. Rows-only-by-
    # nature entries (dedup_minhash_ml, sim_ann_brp, sim_ann_ivf,
    # sim_ann_ivf_pq, rel_sketches, dedup_semantic_ivf,
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
