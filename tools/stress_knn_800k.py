"""r12: kNN-graph recall at the 800k capped-K frontier.

`sim_knn_graph`'s IVF-block path (`_ivf_block_knn_candidates`) is the
last embedding-tier operator whose at-scale quality had never been
measured: its recall floor is pinned at sf0.01 only, and the pair tier
proved (STRESS_r11) that fixture-scale recall does NOT transfer to the
capped-K regime. This tool runs the FULL 800k-vector graph (k=3,
IVF_PAIR_PROBES=2 coarse lists) and measures recall on a deterministic
200-probe sample (vec_id % 4000 == 0 — every label class sampled)
against the exact broadcast-scan truth (the `sim_cosine_topk` plan
shape, proven at this corpus in STRESS_r11 `ann_800k`):

- STRICT set recall@3: |graph edges ∩ exact top-3| / 3 per probe.
- TIE-FAIR value recall@3: a graph edge counts if its cosine >= the
  probe's exact 3rd-best cosine. The fanout-400 stress corpus holds
  ~400 near-clones per source vector whose cosines collide at
  round(·,6); strict set identity then depends on the neighbor-id
  tie-break seeing ALL tied candidates, which an IVF-list method by
  construction does not — value recall is the honest quality metric
  under ties, strict recall the lower bound.

Results merge into STRESS_r12.json under "knn_800k". Usage:

    python tools/stress_knn_800k.py
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
PROBE_STEP = 4000  # 800k / 4000 = 200 probe vectors


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import (
        table_row_count,
    )

    if not os.path.isdir(D):
        print(f"missing corpus {D}; regenerate with tools/stress_100x.py "
              "gen at fanout 400")
        return 1

    spark = get_spark("stress_knn_800k")
    n = table_row_count(D, "embeddings")
    assert n > S.GEMM_EXACT_MAX

    # full-graph construction, probe rows collected (the graph is
    # corpus-sized — collecting all of it is the driver-kill class)
    t0 = time.time()
    graph = S.sim_knn_graph(spark, D).persist()
    n_edges = graph.count()
    t_graph = round(time.time() - t0, 2)
    got_rows = graph.filter(F.col("vec_id") % PROBE_STEP == 0).collect()
    graph.unpersist()
    got: dict[int, list] = {}
    for r in got_rows:
        got.setdefault(r.vec_id, []).append((r.neighbor_id, r.cosine))

    # exact truth for the probes — the proven broadcast + WindowGroupLimit
    # shape of sim_cosine_topk, probe set swapped in
    emb = load_table(spark, D, "embeddings", rebalance=True)
    q = S._with_norm(
        emb.filter(F.col("vec_id") % PROBE_STEP == 0), "query_id", "qv"
    )
    c = S._with_norm(emb, "neighbor_id", "cv")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    t0 = time.time()
    truth_rows = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                S._dot(F.col("qv"), F.col("cv"))
                / (F.col("query_id_norm") * F.col("neighbor_id_norm")),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= S.KNN_K)
        .select("query_id", "neighbor_id", "cosine")
        .collect()
    )
    t_truth = round(time.time() - t0, 2)
    truth: dict[int, list] = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine))

    k = S.KNN_K
    strict_hits = value_hits = total = 0
    for qid, tlist in truth.items():
        tset = {nid for nid, _ in tlist}
        kth = min(cos for _, cos in tlist)
        glist = got.get(qid, [])
        strict_hits += len({nid for nid, _ in glist} & tset)
        value_hits += sum(1 for _, cos in glist if cos >= kth)
        total += k

    section = {
        "corpus": f"{D} ({n} vectors — above GEMM_EXACT_MAX, capped-K "
                  "IVF-block regime)",
        "heap": "8g (default)",
        "k": k,
        "graph_wall_sec_full_corpus": t_graph,
        "n_edges": n_edges,
        "n_probes": len(truth),
        "probe_truth_sec_exact_broadcast_scan": t_truth,
        "strict_set_recall_at_3": round(strict_hits / total, 4),
        "tie_fair_value_recall_at_3": round(value_hits / total, 4),
        "note": "value recall counts an edge whose cosine ties or beats "
                "the exact 3rd-best; the fanout corpus's ~400 near-clone "
                "ties at round(6) make strict set identity depend on "
                "seeing every tied candidate, which an IVF-list method "
                "by construction does not",
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc["knn_800k"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
