"""SemDeDup scale evidence (VERDICT r5 #4: "stress-measured work ∝
Σ list²"): run ``dedup_semantic_ivf`` on the 100k-vector corpus that
``stress_embed50.py`` generates (fanout 50 of sf0.1 — run that first,
or pass --gen to build it here) and record, next to the wall time, the
coarse-cluster size audit of the pair stage: sum(list²)/n² is the
fraction of the n² pair work the IVF-list candidate generation
performs. At 20k vectors the same audit reads ~0.40; the 1/n curve is
what makes the pass exist at 10⁹ vectors.

Writes a ``semdedup_100k`` section to STRESS_r06.json.

Usage: python tools/stress_semdedup.py [--gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = "/tmp/spark_graft_embed50"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STRESS_r06.json",
)


def main() -> int:
    if "--gen" in sys.argv or not os.path.exists(f"{DIR}/embeddings.parquet"):
        from tools.stress_embed50 import generate

        generate()

    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.operators.dedup import (
        dedup_semantic_ivf,
    )
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import table_row_count

    spark = get_spark("stress_semdedup")
    n = table_row_count(DIR, "embeddings")
    t0 = time.time()
    kept = (
        dedup_semantic_ivf(spark, DIR)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("kept").cast("int")).alias("kept"),
        )
        .collect()[0]
    )
    wall = round(time.time() - t0, 2)

    emb = load_table(spark, DIR, "embeddings", rebalance=True)
    sizes = [
        r["cnt"]
        for r in S._ivf_assigned(emb, n, S.IVF_PAIR_PROBES)
        .groupBy("lst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    section = {
        "n_vectors": n,
        "wall_sec": wall,
        "n_kept": int(kept["kept"]),
        "n_dropped": int(kept["n"] - kept["kept"]),
        "pair_stage_audit": {
            "n_lists": len(sizes),
            "max_list": max(sizes),
            "sum_sq_over_n_sq": round(
                sum(s * s for s in sizes) / float(n) ** 2, 4
            ),
        },
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc["semdedup_100k"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section))
    return 0


if __name__ == "__main__":
    sys.exit(main())
