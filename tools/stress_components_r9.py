"""r9 stress: prove VERDICT r8 #1's fix — dedup_components at the 100x
dense-dup corpus (500k docs, dup groups of 10, per-source shingle
overlap c(s)≈100) completes at the DEFAULT 8 GiB heap.

r8's STRESS row recorded this exact query KILLING the SparkContext
(8 GiB OOM / >50 GB spill) through the uncapped exploded-shingle
self-join's Σ c(s)² pair stage. The fix (dedup.py::_shingle_candidates)
applies the LSH_BUCKET_CAP idiom to shingle keys — buckets over
SHINGLE_DF_CAP docs are skipped BEFORE any pair is generated, skips
audited via jaccard_hot_shingles — then re-verifies candidates exactly
against the full shingle arrays, so the surviving pairs' jaccard is
EXACT (oracle hashes unchanged at sf0.01/sf0.1, driver-checked).

Also times the two siblings that ride the same candidate stage
(dedup_ngram_jaccard, dedup_containment) and records the over-cap
shingle census at both scales, proving the cap engages at 100x
(c(s)≈100 > 64) while the fixtures stay untouched (max df 25).

Results merge into STRESS_r09.json under "components_fix". Usage:

    python tools/stress_components_r9.py

Requires the stress_100x corpora at /tmp/spark_graft_100x (run
tools/stress_100x.py first if absent — this script reuses its gen()).
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

QUERIES = ["dedup_ngram_jaccard", "dedup_containment", "dedup_components",
           "pipeline_dedup_mix"]


def main() -> int:
    dirs = {10: f"{BASE}/f10", 100: f"{BASE}/f100"}
    for fanout, d in dirs.items():
        if not os.path.isdir(d):
            from tools.stress_100x import gen
            gen(fanout, d)

    from bench import _canary
    from mqtt_influx_storage_service_spark.operators import all_queries
    from mqtt_influx_storage_service_spark.operators.dedup import (
        SHINGLE_DF_CAP, jaccard_hot_shingles, release_shingles)
    from mqtt_influx_storage_service_spark.session import get_spark

    spark = get_spark("stress_components_r9")
    qs = all_queries()
    row: dict = {
        "fix": "dedup.py::_shingle_candidates — SHINGLE_DF_CAP applied "
               "BEFORE pair aggregation (VERDICT r8 #1); exact verify via "
               "array_intersect keeps surviving jaccard/containment exact",
        "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g (default)"),
        "reps": 2,
        "canary_start_sec": round(_canary(spark), 3),
        "timings": {},
        "rows": {},
    }
    for fanout, d in dirs.items():
        for name in QUERIES:
            best = None
            for _ in range(2):
                release_shingles(spark)
                t0 = time.time()
                try:
                    qs[name](spark, d).write.format("noop").mode(
                        "overwrite").save()
                    t = time.time() - t0
                    best = t if best is None else min(best, t)
                except Exception as exc:  # noqa: BLE001 - record, keep going
                    row.setdefault("errors", {})[f"{name}@{fanout}x"] = (
                        str(exc)[:500])
                    break
            row["timings"][f"{name}@{fanout}x"] = (
                round(best, 2) if best is not None else None)
            print(fanout, name, row["timings"][f"{name}@{fanout}x"],
                  flush=True)
        # result sizes adjudicate recall: within-group dups share
        # group-unique (under-cap) shingles, so the capped candidate
        # stage must still surface them
        release_shingles(spark)
        row["rows"][f"dedup_components_reps@{fanout}x"] = (
            qs["dedup_components"](spark, d)
            .filter("is_representative").count())
        hot = sorted(
            jaccard_hot_shingles(spark, d).collect(), key=lambda r: -r["df"])
        row["rows"][f"hot_shingles@{fanout}x"] = {
            "cap": SHINGLE_DF_CAP,
            "n_over_cap": len(hot),
            "worst_df": [r["df"] for r in hot[:5]],
        }
        release_shingles(spark)
    row["canary_end_sec"] = round(_canary(spark), 3)

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    # merge, don't replace: cap_recall_10x and other ad-hoc evidence
    # keys recorded under components_fix must survive a re-run
    results["components_fix"] = {**results.get("components_fix", {}), **row}
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
