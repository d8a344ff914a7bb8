"""r12: sim_ann_lsh at the 800k frontier — completing the embedding-tier
quality matrix (query-tier IVF, IVF-PQ, BRP, kNN graph, SemDeDup all
hold 800k rows; the hyperplane-bucket ANN was the last without one).

`sim_ann_lsh` is registered with the FIXTURE-tuned geometry
(LSH_PLANES=6 → 64 buckets; the docstring documents 16-24 planes as
the knob for real clustered corpora), so this row measures what that
declared configuration does at 800k vectors: recall@5 for the 100-query
set against the exact `sim_cosine_topk` truth (the broadcast-scan plan
proven at this corpus, STRESS_r11 `ann_800k`), wall time, and the
candidate volume the 22-probe multi-probe join materializes
(~n/64 rows per probed bucket — the number the plane count controls).

Results merge into STRESS_r12.json under "lsh_800k". Usage:

    python tools/stress_lsh_800k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/tmp/spark_graft_800k"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r12.json")


def _topk_sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> int:
    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources.tables import (
        table_row_count,
    )

    if not os.path.isdir(D):
        print(f"missing corpus {D}; regenerate with tools/stress_100x.py "
              "gen at fanout 400")
        return 1

    spark = get_spark("stress_lsh_800k")
    n = table_row_count(D, "embeddings")

    t0 = time.time()
    truth = _topk_sets(S.sim_cosine_topk(spark, D).collect())
    t_truth = round(time.time() - t0, 2)
    total = sum(len(v) for v in truth.values())

    t0 = time.time()
    got = _topk_sets(S.sim_ann_lsh(spark, D).collect())
    t_lsh = round(time.time() - t0, 2)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)

    n_buckets = 1 << S.LSH_PLANES
    n_probes = 1 + S.LSH_PLANES + S.LSH_PLANES * (S.LSH_PLANES - 1) // 2
    section = {
        "corpus": f"{D} ({n} vectors)",
        "heap": "8g (default)",
        "planes": S.LSH_PLANES,
        "n_buckets": n_buckets,
        "multi_probe_buckets": n_probes,
        "recall_at_5": round(hits / total, 4),
        "lsh_sec": t_lsh,
        "brute_force_truth_sec": t_truth,
        "approx_candidates_per_query": int(n / n_buckets * n_probes),
        "note": "fixture-tuned geometry (6 planes) measured as declared: "
                "at 800k the 22-probe join scans ~34% of the corpus per "
                "query — the documented LSH_PLANES knob (16-24 on real "
                "clustered corpora) is what shrinks this; the IVF family "
                "is the engine's actual scale path and holds its own "
                "800k rows",
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc["lsh_800k"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
