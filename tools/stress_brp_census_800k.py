"""r12: the actual `brp_census_800k` row (VERDICT r11 #1b).

The r11 snapshot commit put a BROADCAST hint on the bounded query side
of sim_ann_brp's approxSimilarityJoin — motivated by an 800k skew
census that found the unhinted plan shuffling BOTH sides by the
(hash-table, bucket) key, concentrating the ~600-entry query set's
handful of buckets on one task — and cited a census row that was never
written. This tool measures BOTH variants for real on
/tmp/spark_graft_800k under the skew-census protocol (status-store
task quantiles, the same detectors as tools/skew_census.py):

- BEFORE: the hint stripped (F.broadcast patched to identity for the
  run), i.e. the plan the census originally flagged;
- AFTER: the shipped operator, hint intact — plus a plan assertion
  that the LSH join resolved to a BroadcastHashJoin on
  (entry, hashValue) with no bucket-key exchange (the same pin
  tests/test_mlops.py holds at fixture scale).

Results merge into STRESS_r12.json under "brp_census_800k". Usage:

    python tools/stress_brp_census_800k.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/tmp/spark_graft_800k"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r12.json")


def _run_variant(spark, base, seen, fn, sf):
    from tools.skew_census import _audit_stage, _settle, _stage_rows

    _stage_rows(base, seen)  # absorb prior stages
    df = fn(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - t0, 2)
    _settle(base)
    stages = [r for s in _stage_rows(base, seen)
              if (r := _audit_stage(base, s))]
    return {
        "wall_sec": wall,
        "n_stages_audited": len(stages),
        "stages": sorted(stages, key=lambda r: -r["ratio"]),
        "broadcast_hash_join_on_bucket_key":
            "BroadcastHashJoin [entry" in plan,
        "bucket_key_exchange": "hashpartitioning(entry" in plan,
    }


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import mlops
    from mqtt_influx_storage_service_spark.session import tune

    if not os.path.isdir(D):
        print(f"missing corpus {D}; regenerate with tools/stress_100x.py "
              "gen at fanout 400")
        return 1

    spark = tune(
        SparkSession.builder.master("local[32]")
        .appName("stress-brp-census-800k")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4061")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl or "http://localhost:4061"
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"

    seen: set[tuple[int, int]] = set()
    # BEFORE: strip the hint (identity broadcast) — the r11 straggler
    # plan. mlops reads F.broadcast at call time from the shared
    # functions module, so patching it here affects only this variant.
    with mock.patch.object(F, "broadcast", lambda df: df):
        before = _run_variant(spark, base, seen, mlops.sim_ann_brp, D)
    after = _run_variant(spark, base, seen, mlops.sim_ann_brp, D)

    assert after["broadcast_hash_join_on_bucket_key"], \
        "hint did not survive approxSimilarityJoin"
    assert not after["bucket_key_exchange"], \
        "bucket-key exchange present despite the hint"

    section = {
        "corpus": f"{D} (800000 vectors)",
        "heap": "8g (default)",
        "protocol": "tools/skew_census.py stage audit "
                    "(status-store task quantiles)",
        "before_no_hint": before,
        "after_broadcast_hint": after,
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc["brp_census_800k"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
