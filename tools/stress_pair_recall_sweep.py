"""r11 pair-tier recall/cost sweep at the 800k capped-K frontier.

tools/stress_ann_800k.py measured the IVF-gated pair stage
(sim_threshold_pairs / dedup_semantic above GEMM_EXACT_MAX) at the
DEFAULT config (probes=2, IVF_SAMPLE=2048 → K capped at 256→282) and
found pair recall 0.4668 against the sampled exact truth — the query
tier holds 1.0 but the SYMMETRIC tier loses half the true pairs at
800k: a pair is found only when the two vectors' top-p lists
intersect, and a 282-list quantizer over a 2000-cluster corpus puts
moderately-similar (cos≥0.4) cross-cluster pairs in disjoint lists.

This sweep measures recall AND Σ list²/n² (the pair-budget bound)
across the two knobs — multi-assign width p and the K cap via
IVF_SAMPLE — to pick a default that restores recall while keeping the
budget linear-in-n:

  Σ list² ≈ K·(p·n/K)² = p²·n²/K, so at K = p·n/L (uncapped) the
  budget is p·n·L — raising the SAMPLE (which lifts the K cap)
  makes wider probing CHEAPER than probing wider under a capped K.

Truth is computed once (1,000 deterministic probes, exact broadcast
scan) and persisted to parquet for reuse. Results merge into
STRESS_r11.json under "pair_recall_sweep". Usage:

    python tools/stress_pair_recall_sweep.py [--corpus /tmp/spark_graft_800k]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r11.json")
PROBE_STEP = 800


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/spark_graft_800k")
    ap.add_argument("--truth", default="/tmp/ann800k_truth.parquet")
    args = ap.parse_args()

    import numpy as np  # noqa: F401
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import mlops, similarity
    from mqtt_influx_storage_service_spark.operators.similarity import (
        SIM_THRESHOLD,
        _dot,
        _ivf_assigned,
        _ivf_gemm_candidate_pairs,
        _verify_cosine_pairs,
        _with_norm,
    )
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources.tables import (
        load_table,
        table_row_count,
    )

    spark = get_spark("stress_pair_recall_sweep")
    D = args.corpus
    n_vecs = table_row_count(D, "embeddings")
    emb = load_table(spark, D, "embeddings", rebalance=True)
    step = max(1, n_vecs // 1000)

    if not os.path.exists(args.truth):
        probes_df = _with_norm(
            emb.filter(F.col("vec_id") % step == 0), "id_p", "vp"
        )
        corpus = _with_norm(emb, "id_c", "vc")
        t0 = time.time()
        (
            F.broadcast(probes_df)
            .crossJoin(corpus)
            .filter(F.col("id_p") != F.col("id_c"))
            .withColumn(
                "cosine",
                F.round(
                    _dot(F.col("vp"), F.col("vc"))
                    / (F.col("id_p_norm") * F.col("id_c_norm")),
                    6,
                ),
            )
            .filter(F.col("cosine") >= SIM_THRESHOLD)
            .select(
                F.least("id_p", "id_c").alias("id_a"),
                F.greatest("id_p", "id_c").alias("id_b"),
            )
            .distinct()
            .write.mode("overwrite")
            .parquet(args.truth)
        )
        print(f"truth written [{time.time()-t0:.1f}s]", flush=True)
    truth = spark.read.parquet(args.truth).persist()
    n_truth = truth.count()
    probe_ids = emb.filter(F.col("vec_id") % step == 0).select(
        F.col("vec_id").alias("pid")
    )

    audit: dict = {
        "corpus": f"{D} ({n_vecs} vectors)",
        "threshold": SIM_THRESHOLD,
        "truth_pairs_probe_restricted": n_truth,
        "configs": {},
    }

    configs = [
        ("p2_sample8192", 2, 8192),
        ("p3_sample8192", 3, 8192),
        ("p4_sample8192", 4, 8192),
        # p3_sample2048 (probing wider while K stays capped at 256+)
        # is NOT in the list: its first run blew Σ list² to ~0.032·n²
        # (~2e10 candidate pairs) and died with
        # UNABLE_TO_ACQUIRE_MEMORY at the default 8 GiB heap — the
        # docstring's "wider probing under a capped K" trap, recorded
        # as an evidence row by the runner below.
    ]
    audit["configs"]["p3_sample2048"] = {
        "probes": 3,
        "ivf_sample": 2048,
        "error": "SparkOutOfMemoryError UNABLE_TO_ACQUIRE_MEMORY at the "
                 "default 8 GiB heap (Sigma list^2 ~ 0.032 n^2 with K "
                 "still capped at 256 pre-split) — wider probing under "
                 "a capped K is the budget trap, not a recall fix",
    }
    sample_was = mlops.IVF_SAMPLE
    for label, p, sample in configs:
        mlops.IVF_SAMPLE = sample
        try:
            # list-balance audit for this config (cheap: one groupBy)
            assigned = _ivf_assigned(emb, n_vecs, p)
            sizes = (
                assigned.groupBy("lst").count().select("count").collect()
            )
            counts = [r["count"] for r in sizes]
            ssq = sum(c * c for c in counts) / (n_vecs * n_vecs)
            t0 = time.time()
            cand = _ivf_gemm_candidate_pairs(
                emb, n_vecs, SIM_THRESHOLD, probes=p
            )
            found = (
                _verify_cosine_pairs(emb, cand, SIM_THRESHOLD)
                .select("id_a", "id_b")
                .persist()
            )
            n_found = found.count()
            sec = time.time() - t0
            found_probe = (
                found.join(
                    F.broadcast(probe_ids),
                    (F.col("id_a") == F.col("pid"))
                    | (F.col("id_b") == F.col("pid")),
                )
                .select("id_a", "id_b")
                .distinct()
            )
            n_probe = found_probe.count()
            n_hit = found_probe.join(truth, ["id_a", "id_b"]).count()
            row = {
                "probes": p,
                "ivf_sample": sample,
                "n_lists": len(counts),
                "max_list": max(counts),
                "mean_list": round(sum(counts) / len(counts), 1),
                "sum_sq_over_n_sq": round(ssq, 5),
                "recall": round(n_hit / n_truth, 4),
                "false_pairs_probe_restricted": n_probe - n_hit,
                "pairs_found_total": n_found,
                "sec": round(sec, 1),
            }
            found.unpersist()
        except Exception as exc:  # noqa: BLE001 - sweep must finish
            row = {"probes": p, "ivf_sample": sample,
                   "error": str(exc).splitlines()[0][:300]}
        finally:
            mlops.IVF_SAMPLE = sample_was
        audit["configs"][label] = row
        print(label, json.dumps(row), flush=True)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["pair_recall_sweep"] = audit
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(audit, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
