"""r11 ANN recall audit at the capped-K frontier (VERDICT r10 #3).

The r10 splitter fix proved the 800k-vector corpus keeps its pair
BUDGET (Σ list²/n² = 0.0174, shrinking) — but recall above the
IVF_SAMPLE//8 cap crossover (~524k vectors) had never been measured:
the r9 recall-1.0 rows stop at 200k, below the regime where K stops
growing and list sizes start growing again. This audit measures both
tiers on /tmp/spark_graft_800k (800k vectors, stress_100x recipe at
fanout 400):

- QUERY tier: ``sim_ann_ivf`` (scaled nprobe and the r8 fixed nprobe)
  vs the exact brute-force truth ``sim_cosine_topk`` — the same
  set-overlap protocol as tools/stress_ivf_recall.py, at 4x its
  largest corpus.
- PAIR tier: the IVF-gated candidate stage under
  ``sim_threshold_pairs`` (shared by dedup_semantic above
  GEMM_EXACT_MAX) vs a SAMPLED exact truth: the full 800k² truth is
  6.4e11 dot products (neither Spark nor DuckDB finishes it — the
  r8 heap-kill class), so 1,000 deterministic probe vectors
  (vec_id % 800 == 0) get an exact broadcast scan against the whole
  corpus, and recall is measured on the probe-touching pairs. The
  probes ride the corpus's cluster structure (every label class is
  sampled), so the estimate is unbiased across list shapes.
  Precision is checked on the same restriction (must be 1.0 — the
  pair tier exact-verifies every candidate).

Results merge into STRESS_r11.json under "ann_800k". Usage:

    python tools/stress_ann_800k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/tmp/spark_graft_800k"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r11.json")
PROBE_STEP = 800  # 800k / 800 = 1,000 probe vectors


def _topk_sets(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> int:
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import mlops, similarity
    from mqtt_influx_storage_service_spark.operators.similarity import (
        SIM_THRESHOLD,
        _dot,
        _with_norm,
    )
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources.tables import (
        load_table,
        table_row_count,
    )

    if not os.path.isdir(D):
        print(f"missing corpus {D}; regenerate with tools/stress_100x.py "
              "gen at fanout 400")
        return 1

    spark = get_spark("stress_ann_800k")
    n_vecs = table_row_count(D, "embeddings")
    k_lists = mlops._ivf_k(n_vecs)
    audit: dict = {
        "corpus": f"{D} ({n_vecs} vectors — above the ~524k capped-K "
                  "crossover)",
        "n_lists": k_lists,
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g (default)"),
    }

    # ---- query tier: sim_ann_ivf vs exact brute force ----------------
    t0 = time.time()
    truth = _topk_sets(similarity.sim_cosine_topk(spark, D).collect())
    t_truth = time.time() - t0
    total = sum(len(v) for v in truth.values())
    qrow = {"brute_force_sec": round(t_truth, 2), "configs": {}}
    for label, nprobe in (
        ("fixed_nprobe_r8", mlops.IVF_NPROBE),
        ("scaled_nprobe_r9", mlops._ivf_nprobe(n_vecs)),
    ):
        t0 = time.time()
        got = _topk_sets(mlops.sim_ann_ivf(spark, D, nprobe=nprobe).collect())
        sec = time.time() - t0
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        qrow["configs"][label] = {
            "nprobe": nprobe,
            "probed_fraction": round(nprobe / k_lists, 3),
            "recall": round(hits / total, 4),
            "sec": round(sec, 2),
        }
        print("query_tier", label, qrow["configs"][label], flush=True)
    audit["query_tier"] = qrow

    # ---- pair tier: sampled exact truth for the IVF-gated stage ------
    emb = load_table(spark, D, "embeddings", rebalance=True)
    probes = _with_norm(
        emb.filter(F.col("vec_id") % PROBE_STEP == 0), "id_p", "vp"
    )
    corpus = _with_norm(emb, "id_c", "vc")
    t0 = time.time()
    truth_pairs = (
        F.broadcast(probes)
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
        .persist()
    )
    n_truth = truth_pairs.count()
    t_probe_truth = time.time() - t0
    print(f"pair_tier truth: {n_truth} probe-touching pairs "
          f"[{t_probe_truth:.1f}s]", flush=True)

    t0 = time.time()
    found = (
        similarity.sim_threshold_pairs(spark, D)
        .select("id_a", "id_b")
        .persist()
    )
    n_found_total = found.count()
    t_pairs = time.time() - t0

    probe_ids = emb.filter(F.col("vec_id") % PROBE_STEP == 0).select(
        F.col("vec_id").alias("pid")
    )
    found_probe = (
        found.join(F.broadcast(probe_ids),
                   (F.col("id_a") == F.col("pid"))
                   | (F.col("id_b") == F.col("pid")))
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    n_found_probe = found_probe.count()
    n_hit = found_probe.join(truth_pairs, ["id_a", "id_b"]).count()
    audit["pair_tier"] = {
        "threshold": SIM_THRESHOLD,
        "n_probes": n_vecs // PROBE_STEP,
        "truth_pairs_probe_restricted": n_truth,
        "truth_sec_exact_broadcast_scan": round(t_probe_truth, 1),
        "pair_stage_sec_full_corpus": round(t_pairs, 1),
        "pairs_found_total": n_found_total,
        "pairs_found_probe_restricted": n_found_probe,
        "recall": round(n_hit / n_truth, 4) if n_truth else None,
        "false_pairs_probe_restricted": n_found_probe - n_hit,
    }
    print("pair_tier", json.dumps(audit["pair_tier"]), flush=True)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["ann_800k"] = audit
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(audit, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
