"""r11: pair-tier recall AS A FUNCTION OF THRESHOLD at 800k, under the
new adaptive-sample default (similarity.PAIR_SAMPLE_MAX).

The 0.4668→0.4882 recalls in `pair_recall_sweep` are measured at
SIM_THRESHOLD=0.4 — on the fanout-400 stress corpus that is a LOW bar
(each probe has ~1,172 partners; 210M+ total qualifying pairs), far
below the near-dup regime the pair tier's consumers (dedup_semantic /
SemDeDup-style dedup) operate in. A single number hides the shape
that matters: IVF co-occurrence recall should climb toward 1.0 as the
threshold rises into the near-dup band, because closer pairs share
coarse lists. This measures the curve: recall per cosine band over
the sampled exact truth, for the default probes=2 and the probes=3
escape hatch, plus the list-balance audit of the new default at 800k
and the 200k continuity check (the r10 evidence corpus).

Results merge into STRESS_r11.json under "pair_threshold_curve".
Usage:

    python tools/stress_pair_threshold_curve.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/tmp/spark_graft_800k"
D200 = "/tmp/spark_graft_100x/f100"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r11.json")
TRUTH = "/tmp/ann800k_truth_cos.parquet"
BANDS = [(0.4, 0.5), (0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 0.9),
         (0.9, 1.01)]


def main() -> int:
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import similarity
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

    spark = get_spark("stress_pair_threshold_curve")
    n_vecs = table_row_count(D, "embeddings")
    emb = load_table(spark, D, "embeddings", rebalance=True)
    step = max(1, n_vecs // 1000)

    if not os.path.exists(TRUTH):
        probes_df = _with_norm(
            emb.filter(F.col("vec_id") % step == 0), "id_p", "vp")
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
                    / (F.col("id_p_norm") * F.col("id_c_norm")), 6),
            )
            .filter(F.col("cosine") >= SIM_THRESHOLD)
            .select(
                F.least("id_p", "id_c").alias("id_a"),
                F.greatest("id_p", "id_c").alias("id_b"),
                "cosine",
            )
            .groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))
            .write.mode("overwrite").parquet(TRUTH)
        )
        print(f"truth written [{time.time()-t0:.1f}s]", flush=True)
    truth = spark.read.parquet(TRUTH).persist()
    n_truth = truth.count()
    probe_ids = emb.filter(F.col("vec_id") % step == 0).select(
        F.col("vec_id").alias("pid"))

    audit: dict = {
        "corpus": f"{D} ({n_vecs} vectors)",
        "pair_sample_max": similarity.PAIR_SAMPLE_MAX,
        "truth_pairs": n_truth,
        # The measurement pipeline (GEMM -> verify -> probe-restrict ->
        # band joins in one plan) runs at 16g; the PRODUCTION pair
        # stage alone was separately proven at the default 8g heap
        # (STRESS_r11 ann_800k: 485s / pair_recall_sweep: 503s).
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g (default)"),
        "configs": {},
    }

    # probes=3 is NOT re-measured here: its threshold-0.4 recall
    # (0.5713) and budget are already in `pair_recall_sweep`, and the
    # default_p2 band curve (>= 0.9975 at cosine >= 0.7) already
    # settles the default; the p3 candidate spill additionally
    # overflows this box's 80 GB free disk at band-measurement scale.
    for label, p in (("default_p2", 2),):
        # balance audit under the new adaptive default
        assigned = _ivf_assigned(emb, n_vecs, p)
        counts = [r["count"]
                  for r in assigned.groupBy("lst").count().collect()]
        t0 = time.time()
        cand = _ivf_gemm_candidate_pairs(emb, n_vecs, SIM_THRESHOLD,
                                         probes=p)
        # materialize the found pairs to parquet FIRST (the production
        # shape, proven at the 8g heap by ann_800k) — chaining the
        # probe restriction into the same plan turned the broadcast
        # join over 230M verified rows into an in-plan nested loop
        # whose concurrent spills filled the disk on the first attempt
        fp = f"/tmp/found_pairs_{label}.parquet"
        (
            _verify_cosine_pairs(emb, cand, SIM_THRESHOLD)
            .select("id_a", "id_b")
            .write.mode("overwrite").parquet(fp)
        )
        sec = time.time() - t0
        fdf = spark.read.parquet(fp)
        found = (
            fdf.join(F.broadcast(probe_ids), F.col("id_a") == F.col("pid"))
            .select("id_a", "id_b")
            .unionByName(
                fdf.join(F.broadcast(probe_ids),
                         F.col("id_b") == F.col("pid"))
                .select("id_a", "id_b"))
            .distinct()
            .persist()
        )
        n_found = found.count()
        joined = truth.join(found.withColumn("hit", F.lit(1)),
                            ["id_a", "id_b"], "left_outer").persist()
        bands = {}
        for lo, hi in BANDS:
            seg = joined.filter(
                (F.col("cosine") >= lo) & (F.col("cosine") < hi))
            tot = seg.count()
            hit = seg.filter(F.col("hit") == 1).count()
            bands[f"[{lo},{round(hi,2) if hi <= 1 else 1.0})"] = {
                "truth": tot,
                "recall": round(hit / tot, 4) if tot else None,
            }
        overall = joined.filter(F.col("hit") == 1).count()
        audit["configs"][label] = {
            "probes": p,
            "n_lists": len(counts),
            "max_list": max(counts),
            "mean_list": round(sum(counts) / len(counts), 1),
            "sum_sq_over_n_sq": round(
                sum(c * c for c in counts) / (n_vecs * n_vecs), 5),
            "pair_stage_sec": round(sec, 1),
            "overall_recall": round(overall / n_truth, 4),
            "bands": bands,
        }
        joined.unpersist()
        found.unpersist()
        shutil.rmtree(fp, ignore_errors=True)
        print(label, json.dumps(audit["configs"][label]), flush=True)

    # 200k continuity: the new adaptive sizing must reproduce the r10
    # balance regime below the old crossover (sample stays 2048 there)
    n200 = table_row_count(D200, "embeddings")
    emb200 = load_table(spark, D200, "embeddings", rebalance=True)
    counts = [r["count"] for r in _ivf_assigned(emb200, n200, 2)
              .groupBy("lst").count().collect()]
    audit["continuity_200k"] = {
        "n_vectors": n200,
        "n_lists": len(counts),
        "max_list": max(counts),
        "mean_list": round(sum(counts) / len(counts), 1),
        "sum_sq_over_n_sq": round(
            sum(c * c for c in counts) / (n200 * n200), 5),
        "r10_was": {"n_lists": 247, "max_list": 4491,
                    "sum_sq_over_n_sq": 0.02154},
    }
    print("continuity_200k", json.dumps(audit["continuity_200k"]),
          flush=True)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["pair_threshold_curve"] = audit
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(audit, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
