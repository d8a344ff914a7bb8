"""r12: the actual `semdedup_800k` row (VERDICT r11 #1a).

The r11 snapshot commit rewrote dedup_semantic_ivf's ABOVE-gate path
into one per-cluster Arrow kernel (`_semdedup_list_verdicts`: shuffle
once by first-choice coarse cluster, resolve each list's keeps with
blockwise GEMM against the earlier prefix — no pair relation ever
materializes) and cited a STRESS row that was never written. This tool
runs that kernel for real on /tmp/spark_graft_800k (800,000 vectors,
well above GEMM_EXACT_MAX=10,000, i.e. the production regime) at the
default 8 GiB heap and records:

- wall time + kept/dropped counts of the full verdict relation
  (the OLD pair-form above-gate plan filled an 80 GB disk at this
  corpus/eps before finishing — the row this replaces);
- the cluster-size audit of the ONE shuffle the plan performs
  (first-choice assignment — unlike the pair tier's multi-probe
  lists, so Σ cluster² here bounds the kernel's GEMM work directly);
- a 4-cluster spot integrity check: the distributed verdicts for the
  4 largest clusters recomputed by running the SAME kernel driver-side
  on a direct collect of each cluster — this proves the
  groupBy+applyInPandas distribution delivered complete, correctly
  partitioned groups at scale (the kernel's SEMANTICS vs the
  independent brute-force within-cluster rule are pinned at fixture
  scale by tests/test_dedup.py with the gate forced to 0).

Results merge into STRESS_r12.json under "semdedup_800k". Usage:

    python tools/stress_semdedup_800k.py
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
SPOT_CLUSTERS = 4


def main() -> int:
    import numpy as np
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.operators.dedup import (
        SEMDEDUP_EPS,
        _semdedup_list_verdicts,
        dedup_semantic_ivf,
    )
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import (
        table_row_count,
    )

    if not os.path.isdir(D):
        print(f"missing corpus {D}; regenerate with tools/stress_100x.py "
              "gen at fanout 400")
        return 1

    spark = get_spark("stress_semdedup_800k")
    n = table_row_count(D, "embeddings")
    assert n > S.GEMM_EXACT_MAX, "corpus must exercise the above-gate kernel"

    t0 = time.time()
    verdicts = dedup_semantic_ivf(spark, D)
    agg = verdicts.persist().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)

    # cluster-size audit off the SAME verdict relation (one row per
    # vector carrying its first-choice cluster) — Σ cluster²/n² is the
    # fraction of the n² GEMM work the per-cluster kernel performs
    sizes = [
        r["cnt"]
        for r in verdicts.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    sum_sq = sum(s * s for s in sizes)

    # spot equality: recompute the SPOT_CLUSTERS largest clusters'
    # verdicts on the driver with the brute-force within-cluster rule
    emb = load_table(spark, D, "embeddings", rebalance=True)
    centers = S._pair_centroids(emb, n)
    top = (
        verdicts.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(SPOT_CLUSTERS)
        .collect()
    )
    spot_ids = [r["cluster"] for r in top]

    from mqtt_influx_storage_service_spark.operators.dedup import (
        _ivf_priority_udf,
    )

    spot_ok = True
    mismatches = 0
    for cl in spot_ids:
        rows = (
            emb.select(
                "vec_id",
                "embedding",
                _ivf_priority_udf(centers)(F.col("embedding")).alias("a"),
            )
            .filter(F.col("a.cl") == int(cl))
            .select(
                "vec_id",
                F.col("a.cl").alias("cl"),
                F.col("a.cos_c").alias("cos_c"),
                F.col("embedding").alias("emb"),
            )
            .toPandas()
        )
        expect = _semdedup_list_verdicts(SEMDEDUP_EPS)(rows)
        got = {
            r.vec_id: r.kept
            for r in verdicts.filter(F.col("cluster") == int(cl)).collect()
        }
        exp = dict(zip(expect["vec_id"], expect["kept"]))
        if got != exp:
            spot_ok = False
            mismatches += sum(1 for k in exp if got.get(k) != exp[k])

    verdicts.unpersist()
    section = {
        "corpus": f"{D} ({n} vectors — above GEMM_EXACT_MAX, the "
                  "per-cluster Arrow-kernel regime)",
        "heap": "8g (default)",
        "eps": SEMDEDUP_EPS,
        "wall_sec": wall,
        "n_kept": int(agg["kept"]),
        "n_dropped": int(agg["n"] - agg["kept"]),
        "cluster_audit": {
            "n_clusters": len(sizes),
            "max_cluster": max(sizes),
            "mean_cluster": round(sum(sizes) / len(sizes), 1),
            "sum_sq_over_n_sq": round(sum_sq / float(n) ** 2, 5),
        },
        "spot_equality_top4_clusters": {
            "ok": spot_ok,
            "mismatched_rows": mismatches,
        },
        "note": "replaces the r11 pair-form above-gate plan, which "
                "filled an 80 GB disk at this corpus/eps before "
                "finishing; the kernel plan shuffles the corpus ONCE "
                "by cluster and materializes no pair relation",
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc["semdedup_800k"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section, indent=2))
    return 0 if spot_ok else 1


if __name__ == "__main__":
    sys.exit(main())
