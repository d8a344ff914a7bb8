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
    # ---- r15 ROTATION (VERDICT r14 "Next round" #7 — the queue the
    # r14 rotation comment recorded). Slots 1-41: the full r10-green
    # cohort, now the oldest driver rows in the registry (recomputed
    # from CORRECTNESS_r01..r14 this round: 41 entries whose newest
    # driver row is r10 — the r14 comment said 42; the recount says
    # 41). All oracle-backed.
    "dedup_substring",
    "dedup_substring_spans",
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
    "mm_dedup_payload",
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
    # Slots 42-50: r15-touched entries first (re-certification
    # insurance for every query whose plan or measurement seam changed
    # this round — the r10-r14 precedent), then the alphabetical head
    # of the r11 cohort as filler. The r15-touched set: the two mm
    # kernels whose rebalance decision this round re-measures, and the
    # five queries whose bench floors move to cold-plan timing (their
    # PLANS are unchanged; slots are insurance that the release-seam
    # change kept them green).
    "mm_extract_features",
    "mm_frame_sample",
    "text_bm25",
    "sim_hybrid_rrf",
    "pipeline_training_mix",
    "pipeline_token_budget",
    "pipeline_epochs",
    # r11-cohort filler to slot 50
    "iq_cmo",
    "iq_drop_series",
    # ---- slot 50 boundary. r16 ROTATION QUEUE (if a next round
    # exists): the remaining r11 cohort (iq_ema, iq_ker, iq_math,
    # iq_retention_filter, iq_retention_policies, iq_rsi,
    # iq_show_tag_values_regex, iq_show_tag_values_where, iq_soffset,
    # iq_tag_regex, iq_top_tags, iq_transform_nested, iq_trix, iq_tz,
    # pipeline_shard_plan, pipeline_temperature_mix,
    # ref_narrow_points, ...), then the r12 cohort. After THIS round
    # no registry entry's newest driver row is older than r11.
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
