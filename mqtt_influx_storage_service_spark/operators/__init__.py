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
# row must come first. The r5 rotation (VERDICT r4 "Next round" #1)
# front-loads, in order: (a) the 5 oracle-backed entries that have
# NEVER had a driver row (upgraded/rewritten in r4), (b) the 5 iq_*
# entries new in r5, (c) every operator whose code changed in r5
# (passage semantics, IVF gate, edge cap, epochs int-div), (d) the
# r1-only TPC-H pair (4 rounds stale; their fixture hashes are also
# test-pinned, tests/test_tables.py), then (e) the r2 cohort whose
# newest green is 3 rounds old, back-filled to 50 with the Tier A
# ref_* family (r3). Everything past slot 50 holds an r3/r4 green row
# under the current fixtures, so union-of-rounds coverage stays
# complete. Local tools/check_oracles.py runs the FULL registry
# regardless — the prefix only bounds what the driver re-certifies
# per round.
_PRIORITY = [
    # (a) oracle-backed, never driver-checked
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_knn_graph",
    "sim_ann_lsh",
    "mm_extract_features",
    # (b) new in r5 — InfluxQL function-surface completions + the
    # additive seasonal Holt-Winters pair
    "iq_fill_linear",
    "iq_integral",
    "iq_elapsed",
    "iq_sample",
    "iq_holt_winters",
    "iq_holt_winters_seasonal",
    "iq_series_cardinality",
    "ts_holt_winters_seasonal",
    # (c) changed in r5
    "dedup_passage",
    "sim_threshold_pairs",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_ngram_jaccard",
    "pipeline_epochs",
    # (d) r1-only pair
    "rel_set_ops",
    "rel_merge_join",
    # (e) the r2 cohort
    "dedup_exact",
    "sim_cosine_topk",
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
    "mm_frame_sample",
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
    # back-fill to 50: Tier A reference-semantics family (r3)
    "ref_topic_parse",
    "ref_registry_filter",
    "ref_payload_coercion",
    # ---- slot 50 boundary: everything below overflows the driver's
    # checked prefix; newest green r3 (ts_*/rel_*/iq_* r4 cohorts) or
    # r4 (the 50 operators added that round). Rows-only-by-nature
    # entries (dedup_minhash_ml, sim_ann_brp/ivf/ivf_pq, rel_sketches)
    # stay out of the prefix: a slot spent on them can never go
    # hash-green.
    #
    # r6 ROTATION QUEUE (front-load these next round — oracle-backed
    # entries added late in r5 with no driver row yet): iq_bucket_offset,
    # iq_agg_arithmetic, iq_tag_regex, iq_slimit, iq_limit_offset,
    # iq_raw_derivative, iq_raw_running, iq_nonneg_derivative,
    # iq_scalar_math, pipeline_temperature_mix,
    # dedup_threshold_sweep, dedup_containment, ts_histogram_quantile,
    # ts_burn_rate, ts_availability, mm_dedup_payload — then the
    # r3-green cohort whose rows will be 3 rounds old.
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
