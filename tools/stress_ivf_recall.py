"""r9 IVF recall audit (ADVICE r9 medium): measure recall-vs-brute-force
at 10x and 100x corpus scale, for BOTH the fixed nprobe=IVF_NPROBE the
r8 artifact shipped and the new list-count-scaled _ivf_nprobe default.

r8 reported sim_ann_ivf 162 s -> 2.3 s as a pure speedup, but _ivf_k
scaling (16 -> 98 lists at 200k vectors) with nprobe pinned at 4 cut
the probed fraction from 25% to ~4% — part of that win was an
unquantified recall reduction. This audit quantifies it: exact
brute-force top-k (sim_cosine_topk, query-set-bounded) as ground truth,
set-overlap recall per configuration, plus wall times, so the
speed/recall tradeoff is a measured row instead of prose.

Results merge into STRESS_r09.json under "ivf_recall". Usage:

    python tools/stress_ivf_recall.py

Requires the stress_100x corpora at /tmp/spark_graft_100x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_100x"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r09.json")


def _topk_sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> int:
    from mqtt_influx_storage_service_spark.operators import mlops, similarity
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources.tables import (
        table_row_count,
    )

    spark = get_spark("stress_ivf_recall")
    audit: dict = {
        "truth": "sim_cosine_topk (exact brute force over the bounded "
                 "query set)",
        "topk": similarity.TOPK,
    }
    for fanout in (10, 100):
        d = f"{BASE}/f{fanout}"
        if not os.path.isdir(d):
            print(f"missing corpus {d}; run tools/stress_100x.py first")
            return 1
        n_vecs = table_row_count(d, "embeddings")
        k_lists = mlops._ivf_k(n_vecs)
        t0 = time.time()
        truth = _topk_sets(similarity.sim_cosine_topk(spark, d).collect())
        t_truth = time.time() - t0
        total = sum(len(v) for v in truth.values())
        row = {
            "n_vectors": n_vecs,
            "n_lists": k_lists,
            "brute_force_sec": round(t_truth, 2),
            "configs": {},
        }
        for label, nprobe in (
            ("fixed_nprobe_r8", mlops.IVF_NPROBE),
            ("scaled_nprobe_r9", mlops._ivf_nprobe(n_vecs)),
        ):
            t0 = time.time()
            got = _topk_sets(
                mlops.sim_ann_ivf(spark, d, nprobe=nprobe).collect())
            sec = time.time() - t0
            hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
            row["configs"][label] = {
                "nprobe": nprobe,
                "probed_fraction": round(nprobe / k_lists, 3),
                "recall": round(hits / total, 4),
                "sec": round(sec, 2),
            }
        audit[f"{fanout}x"] = row
        print(fanout, json.dumps(row), flush=True)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["ivf_recall"] = audit
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(audit, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
