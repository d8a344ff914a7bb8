"""r13: sim_ann_lsh at the 800k frontier with the CORPUS-SCALED
geometry (VERDICT r12 #1). r12 measured the fixed fixture geometry
(LSH_PLANES=6, 22-probe) strictly dominated at 800k: 125.2 s vs the
48.6 s exact broadcast scan, ~34% of the corpus scanned per query
(STRESS_r12 `lsh_800k`). sim_ann_lsh now derives planes from corpus
size above LSH_SCALE_GATE (`_lsh_planes`: ceil(log2(n/128)), 13 at
800k → hamming-2 multi-probe scans ~1.1%); this row is the "operator
beats the exact scan at recall >= its pinned floor" evidence the fix
demands: recall@5 for the 100-query set against the exact
`sim_cosine_topk` truth, wall for both plans, and the derived
geometry.

Results merge into STRESS_r13.json under "lsh_800k". Usage:

    python tools/stress_lsh_800k.py [corpus_dir]

With a corpus_dir argument the same recall-vs-exact protocol runs
against that corpus and merges under "lsh_{n//1000}k" — used for the
mid-band geometry point (200k vectors -> 11 derived planes) between
the clustered-corpus unit test (5k, 9 planes) and the 800k frontier
(13 planes). Recall is regime-invariant; walls at non-default corpora
carry whatever machine regime the run landed in (stamp with
bench._canary if they matter).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/tmp/spark_graft_800k"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r13.json")


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

    corpus = sys.argv[1] if len(sys.argv) > 1 else D
    if not os.path.isdir(corpus):
        print(f"missing corpus {corpus}; regenerate with "
              "tools/stress_100x.py gen at fanout 400")
        return 1

    spark = get_spark("stress_lsh_800k")
    n = table_row_count(corpus, "embeddings")

    t0 = time.time()
    truth = _topk_sets(S.sim_cosine_topk(spark, corpus).collect())
    t_truth = round(time.time() - t0, 2)
    total = sum(len(v) for v in truth.values())

    t0 = time.time()
    got = _topk_sets(S.sim_ann_lsh(spark, corpus).collect())
    t_lsh = round(time.time() - t0, 2)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)

    planes = S._lsh_planes(n)
    n_buckets = 1 << planes
    n_probes = 1 + planes + planes * (planes - 1) // 2
    section = {
        "corpus": f"{corpus} ({n} vectors)",
        "heap": "8g (default)",
        "planes_derived": planes,
        "scale_gate": S.LSH_SCALE_GATE,
        "n_buckets": n_buckets,
        "multi_probe_buckets": n_probes,
        "corpus_share_scanned_per_query": round(n_probes / n_buckets, 5),
        "recall_at_5": round(hits / total, 4),
        "recall_floor": 0.95,
        "lsh_sec": t_lsh,
        "brute_force_truth_sec": t_truth,
        "approx_candidates_per_query": int(n / n_buckets * n_probes),
        "r12_fixed_geometry_sec": 125.2,
        "note": "VERDICT r12 #1 closed: corpus-scaled geometry "
                "(ceil(log2(n/128)) planes above LSH_SCALE_GATE, fixture "
                "6-plane oracle-checked geometry below it). r12 measured "
                "the fixed geometry at 125.2 s / ~34% corpus scanned per "
                "query — strictly dominated by the 48.6 s exact scan; "
                "this row is the scaled geometry on the same corpus and "
                "the same truth set.",
    }
    if hits / total < 0.95:
        section["note"] += " RECALL BELOW FLOOR — investigate before publishing."
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    key = f"lsh_{n // 1000}k"
    if corpus != D:
        # the r12 fixed-geometry baseline was measured on the 800k
        # corpus only — a mid-band row has no such comparison point
        section.pop("r12_fixed_geometry_sec", None)
        section["note"] = (
            "mid-band geometry point between the clustered unit test "
            "(5k, 9 planes) and the 800k frontier (13 planes): same "
            "recall-vs-exact protocol, corpus passed on the command "
            "line."
        )
        if hits / total < 0.95:
            section["note"] += (" RECALL BELOW FLOOR — investigate "
                                "before publishing.")
    doc[key] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
