"""50x embedding-tier stress (100k vectors): direct evidence for the
IVF-list scaling claim. At 20k vectors (stress_sf1) the within-list
GEMM does Σ list²/n² ≈ 0.40 of the exact kernel's dot products; at
fixed IVF_TARGET_LIST the ratio shrinks as p²·L/n, so 100k vectors
should show ~0.08 — the curve that reaches ~4·10⁻⁶ at 10⁹ vectors.
This script synthesizes 100k vectors (fanout 50 of sf0.1 with the same
deterministic perturbation scheme as stress_sf1), times the gated
pair/kNN queries, records the list audit, and appends an
``embedding_50x`` section to STRESS_r05.json.

Usage: python tools/stress_embed50.py [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = "/tmp/spark_graft_embed50"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r05.json")
SRC = "/root/testdata/sf0.1"
FANOUT = 50


def generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DIR, exist_ok=True)
    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
    vecs = np.array(emb["embedding"], dtype=np.float32)
    m, d = vecs.shape
    rng = np.random.default_rng(42)
    noise = rng.normal(0.0, 0.02, size=(FANOUT, d)).astype(np.float32)
    ids, labels, rows = [], [], []
    for v in range(FANOUT):
        ids.extend(int(x) * FANOUT + v for x in emb["vec_id"])
        labels.extend(emb["label"])
        rows.append(vecs if v == 0 else vecs + noise[v])
    allv = np.concatenate(rows, axis=0)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(allv), pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{DIR}/embeddings.parquet",
    )
    print(f"generated {len(ids)} vectors")


def main() -> int:
    if "--skip-gen" not in sys.argv:
        generate()

    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import table_row_count

    spark = get_spark("stress_embed50")
    section: dict = {"n_vectors": table_row_count(DIR, "embeddings"),
                     "timings": {}}
    for name, fn in (
        ("sim_threshold_pairs", S.sim_threshold_pairs),
        ("sim_knn_graph", S.sim_knn_graph),
    ):
        t0 = time.time()
        fn(spark, DIR).write.format("noop").mode("overwrite").save()
        section["timings"][name] = round(time.time() - t0, 2)
        print(name, section["timings"][name], flush=True)

    emb = load_table(spark, DIR, "embeddings", rebalance=True)
    n = section["n_vectors"]
    sizes = [
        r["cnt"]
        for r in S._ivf_assigned(emb, n, S.IVF_PAIR_PROBES)
        .groupBy("lst")
        .agg({"*": "count"})
        .withColumnRenamed("count(1)", "cnt")
        .collect()
    ]
    section["ivf_audit"] = {
        "n_lists": len(sizes),
        "max_list": max(sizes),
        "sum_sq_over_n_sq": round(sum(s * s for s in sizes) / float(n) ** 2, 4),
    }

    with open(OUT) as fh:
        doc = json.load(fh)
    doc["embedding_50x"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section))
    return 0


if __name__ == "__main__":
    sys.exit(main())
