"""r12: the actual `components_persist` row (VERDICT r11 #5).

Commit fa5f950 (r11) persisted the label-propagation loop's
self-looped edge relation dst-partitioned — the plain union had
destroyed the edge cache's repartition(dst) layout (a Union's output
partitioning is unknown), so every one of the CC_ROUNDS propagation
rounds re-shuffled the full edge+loop table. The commit message
claimed "+44.5% → +13.4% overhead at 100x" with no artifact row; this
tool measures the claim for real on /tmp/spark_graft_100x/f100
(500k docs, dup groups of 10) at the default 8 GiB heap:

- FULL-QUERY overhead: cold min-of-2 walls for dedup_ngram_jaccard
  (the shared candidate+verify stage alone) and dedup_components
  (candidate stage + the CC loop) — overhead = components/jaccard - 1,
  the exact ratio the commit message quoted (r10 protocol,
  tools/stress_components_r9.py);
- LOOP-ISOLATED before/after: with the edge cache primed, run the
  CC_ROUNDS join+agg loop once over the r11 persisted dst-partitioned
  self-loop relation (the shipped `_component_labels`) and once over
  the pre-fix shape (plain unionByName, no repartition, no persist),
  recording wall, completed-stage count and shuffle-read bytes per
  variant off the status-store API — the per-round re-shuffle the fix
  removes, made visible as stage/byte counts.

Results merge into STRESS_r12.json under "components_persist". Usage:

    python tools/stress_components_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/tmp/spark_graft_100x/f100"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r12.json")


def _loop(sym_self, nodes, rounds):
    from pyspark.sql import functions as F

    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(rounds):
        labels = (
            sym_self.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("label").alias("dlabel"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("label"))
            .withColumnRenamed("src", "doc_id")
        )
    return labels


def _timed_noop(base, seen, df):
    from tools.skew_census import _settle, _stage_rows

    _stage_rows(base, seen)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - t0, 2)
    _settle(base)
    raw = _stage_rows(base, seen)
    return {
        "wall_sec": wall,
        "n_stages": len(raw),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes") or 0 for s in raw),
        "shuffle_write_bytes": sum(
            s.get("shuffleWriteBytes") or 0 for s in raw),
    }


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mqtt_influx_storage_service_spark.operators import all_queries
    from mqtt_influx_storage_service_spark.operators import dedup as DD
    from mqtt_influx_storage_service_spark.session import tune

    if not os.path.isdir(D):
        print(f"missing corpus {D}; regenerate with tools/stress_100x.py")
        return 1

    spark = tune(
        SparkSession.builder.master("local[32]")
        .appName("stress-components-r12")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4062")
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl or "http://localhost:4062"
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
    seen: set[tuple[int, int]] = set()

    qs = all_queries()
    timings: dict[str, float] = {}
    for name in ("dedup_ngram_jaccard", "dedup_components"):
        best = None
        for _ in range(2):
            DD.release_shingles(spark)
            t0 = time.monotonic()
            qs[name](spark, D).write.format("noop").mode("overwrite").save()
            t = time.monotonic() - t0
            best = t if best is None else min(best, t)
        timings[name] = round(best, 2)
        print(name, timings[name], flush=True)
    overhead = round(
        100.0 * (timings["dedup_components"] / timings["dedup_ngram_jaccard"]
                 - 1.0), 1)

    # loop-isolated before/after over a primed edge cache
    DD.release_shingles(spark)
    sym = DD._dup_edges(spark, D)
    sym.count()  # prime the persisted edge cache
    nodes = sym.select(F.col("src").alias("doc_id")).distinct()

    after_rel = (
        sym.unionByName(
            nodes.select(
                F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
        )
        .repartition(F.col("dst"))
        .persist()
    )
    after_rel.count()  # materialize, as _component_labels' cache does
    after = _timed_noop(
        base, seen, _loop(after_rel, nodes, DD.CC_ROUNDS))

    before_rel = sym.unionByName(
        nodes.select(
            F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    )
    before = _timed_noop(
        base, seen, _loop(before_rel, nodes, DD.CC_ROUNDS))
    after_rel.unpersist()
    DD.release_shingles(spark)

    section = {
        "corpus": f"{D} (500k docs, dup groups of 10)",
        "heap": "8g (default)",
        "cc_rounds": DD.CC_ROUNDS,
        "full_query_min_of_2": {
            "dedup_ngram_jaccard_sec": timings["dedup_ngram_jaccard"],
            "dedup_components_sec": timings["dedup_components"],
            "components_overhead_over_candidate_stage_pct": overhead,
        },
        "loop_isolated_primed_cache": {
            "before_plain_union": before,
            "after_persisted_dst_partitioned": after,
        },
        "claim": "fa5f950 commit message: overhead +44.5% (r10 plan) "
                 "-> +13.4% (persisted dst-partitioned self-loop); "
                 "this row is the measurement the message lacked",
    }
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            doc = json.load(fh)
    doc["components_persist"] = section
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(section, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
