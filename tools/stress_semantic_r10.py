"""r10 stress: prove VERDICT r9 #5's fix — the hot-centroid split in
the symmetric pair tier flattens dedup_semantic's 100x/10x growth.

r9 measured dedup_semantic's 100x/10x wall ratio at 9.34 — the steepest
curve in the tier — and the ivf_pair_audit_curve pointed at the cause:
one Lloyd list of 13,557 members vs a ~2k mean, dominating the Σ list²
per-list GEMM budget. The fix (similarity.py::_split_hot_centroids)
re-splits any centroid whose TRAINING-SAMPLE ownership exceeds 2x the
target share into ceil(own/target) sub-centroids — all driver-side on
the bounded sample, the balanced-kmeans refinement faiss applies.

Measures, on the same group-count-growth corpora as STRESS_r09
scale_curve (apples-to-apples): dedup_semantic at 10x/100x (min of 2,
caches released between reps) and the per-list audit (n_lists,
max_list, Σ list²/n²) at both scales. Results merge into
STRESS_r10.json under "semantic_balance". Usage:

    python tools/stress_semantic_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_100x"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r10.json")


def main() -> int:
    dirs = {10: f"{BASE}/f10", 100: f"{BASE}/f100"}
    for fanout, d in dirs.items():
        if not os.path.isdir(d):
            from tools.stress_100x import gen
            gen(fanout, d)

    from bench import _canary
    from mqtt_influx_storage_service_spark.operators import (
        all_queries, similarity as S)
    from mqtt_influx_storage_service_spark.operators.dedup import (
        release_semantic, release_shingles)
    from mqtt_influx_storage_service_spark.operators.mlops import (
        release_ivf_training)
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import (
        table_row_count)

    spark = get_spark("stress_semantic_r10")
    qs = all_queries()
    row: dict = {
        "fix": "similarity.py::_pair_centroids — (a) K now sized for the "
               "MULTI-assigned membership count (p·n/IVF_TARGET_LIST; the "
               "old single-assign sizing delivered mean lists of p x the "
               "2048 target, 2x the per-list GEMM budget), and (b) "
               "_split_hot_centroids: centroids owning > 2x the target "
               "sample share (top-p ownership, matching the corpus "
               "assignment) re-split into ceil(own/target) sub-centroids "
               "(driver-side, bounded sample); pair-tier Σ list² no longer "
               "dominated by one hot list",
        "r9_was": {"ratio_100x_over_10x": 9.34, "max_list_100x": 13557},
        "reps": 2,
        "canary_start_sec": round(_canary(spark), 3),
        "timings": {},
        "ivf_pair_audit_curve": {},
    }
    for fanout, d in dirs.items():
        best = None
        for _ in range(2):
            release_shingles(spark)
            release_semantic(spark)
            release_ivf_training(spark)
            t0 = time.time()
            qs["dedup_semantic"](spark, d).write.format("noop").mode(
                "overwrite").save()
            t = time.time() - t0
            best = t if best is None else min(best, t)
        row["timings"][f"dedup_semantic@{fanout}x"] = round(best, 2)
        print(fanout, "dedup_semantic", round(best, 2), flush=True)

        emb = load_table(spark, d, "embeddings", rebalance=True)
        n_vec = table_row_count(d, "embeddings")
        sizes = [
            r["cnt"]
            for r in S._ivf_assigned(emb, n_vec, S.IVF_PAIR_PROBES)
            .groupBy("lst").agg({"*": "count"})
            .withColumnRenamed("count(1)", "cnt").collect()
        ]
        row["ivf_pair_audit_curve"][f"{fanout}x"] = {
            "n_vectors": n_vec,
            "n_lists": len(sizes),
            "max_list": max(sizes) if sizes else 0,
            "mean_list": round(sum(sizes) / max(1, len(sizes)), 1),
            "sum_sq_over_n_sq": round(
                sum(s * s for s in sizes) / float(n_vec) ** 2, 5),
        }
        print(fanout, row["ivf_pair_audit_curve"][f"{fanout}x"], flush=True)
    a = row["timings"]["dedup_semantic@10x"]
    b = row["timings"]["dedup_semantic@100x"]
    row["ratio_100x_over_10x"] = round(b / a, 2)
    row["canary_end_sec"] = round(_canary(spark), 3)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["semantic_balance"] = {
        **results.get("semantic_balance", {}), **row}
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
