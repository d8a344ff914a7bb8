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
# row must come first. r3 re-certified slots 0-49; the r4 prefix is
# EXACTLY the 50 operators ADDED this round (no driver row yet — all
# oracle-backed, so every checked slot can go hash-green). Everything
# past slot 50 already has a green row under the CURRENT fixtures
# (r1 for the TPC-H-only pair rel_set_ops/rel_merge_join, whose inputs
# have never been regenerated; r2/r3 for the rest), so union-of-rounds
# coverage stays complete. Local tools/check_oracles.py runs the FULL
# registry regardless — the prefix only bounds what the driver
# re-certifies per round.
_PRIORITY = [
    # new in r4 — no driver row yet
    "text_pii_scrub",
    "pipeline_curriculum",
    "pipeline_dedup_mix",
    "mm_token_budget",
    "sim_mmr",
    "rel_revenue_threshold",
    "rel_sales_opportunity",
    "rel_top_supplier",
    "ref_line_protocol",
    "iq_subquery_rollup",
    "iq_now_relative",
    "iq_lineitem_profile",
    "iq_top_points",
    "iq_show_series",
    "iq_raw_select",
    "iq_mean_by_day",
    "iq_selectors",
    "iq_percentile_weekly",
    "iq_fill_previous",
    "iq_derivative_daily",
    "iq_regex_union",
    "iq_show_tag_values",
    "text_chunking",
    "emb_quantize_int8",
    "sim_centroid_assign",
    "ts_elapsed",
    "ts_top_per_bucket",
    "ts_sample",
    "ts_changepoint",
    "sim_knn_exact",
    "text_langid_ngram",
    "sim_range_search",
    "ts_pattern_match",
    "ts_downsample",
    "ts_cross_correlation",
    "text_bigram_lm",
    "ts_cumulative_sum",
    "ts_counter_rate",
    "ts_percentile",
    "ts_spread",
    "text_gopher_rules",
    "pipeline_quality_gate",
    "ts_holt_winters",
    "ts_seasonal_profile",
    "ts_mode",
    "text_bm25",
    "sim_hybrid_rrf",
    "pipeline_epochs",
    "rel_waiting_supplier",
    "dedup_passage",
    # ---- slot 50 boundary: everything below overflows the driver's
    # checked prefix. First the r1-only TPC-H pair (their inputs have
    # never been regenerated, so the r01 green rows cannot silently
    # stale), then the cohort whose newest green is r02/r03.
    "rel_set_ops",
    "rel_merge_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_threshold_pairs",
    "sim_knn_graph",
    "sim_ann_lsh",
    "sim_label_centroid",
    "sim_label_trimmed_norm",
    "text_token_stats",
    "text_contamination",
    "text_boilerplate",
    "text_regex_tokens",
    "text_word_freq",
    "text_tfidf_top",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "mm_manifest",
    "mm_extract_features",
    "mm_frame_sample",
    "dedup_minhash_ml",
    "sim_ann_brp",
    "sim_ann_ivf",
    "sim_ann_ivf_pq",
    "pipeline_training_mix",
    "pipeline_token_budget",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "win_topk_per_group",
    "win_percentiles",
    "win_value_frames",
    "win_monthly_revenue",
    "win_ntile_customers",
    "win_rollup",
    "win_cube",
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
