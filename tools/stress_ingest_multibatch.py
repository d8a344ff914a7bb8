"""r9 ingest stress (VERDICT r8 #7): exactly-once ACROSS micro-batch
boundaries at volume.

r8 measured the 10M-frame replay as ONE availableNow batch (throughput
evidence). This run stages the same volume as 10 x 1M-frame staging
rounds, each coalesced to 4 parquet parts (40 part files total),
consumed with maxFilesPerTrigger=4 — ten real 1M-row micro-batches
through the complete reference dataflow (topic parse → union-type
coercion → quarantine split → checkpointed partitioned parquet) — and
KILLS the query mid-replay, then restarts it on the same checkpoint. Exactly-once
holds iff after the restart the sink contains every staged frame exactly
once: total rows == staged rows AND count(distinct frame key) == total
rows (each staged frame carries a unique payload-encoded sequence id).

Evidence recorded (the current round's STRESS json, "ingest_multibatch"): per-phase batch
progress (batch ids + numInputRows from recentProgress), kill point,
post-restart totals, dupe count (must be 0), wall times.

Usage: python tools/stress_ingest_multibatch.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_ingest_mb"
# current-round artifact (the broadcast_census convention): a re-run
# must land in the round being built, never overwrite committed r9
# evidence
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r10.json")
N_FILES = 10
ROWS_PER_FILE = 1_000_000


def stage(spark) -> None:
    """10 staging rounds x 1M frames each, coalesced to 4 parquet
    parts per round (40 part files; the replay consumes 4 per
    micro-batch → ten 1M-row batches). Frames carry a globally unique
    seq in the payload so duplicates are countable after the
    kill/restart."""
    from pyspark.sql import functions as F

    src = f"{BASE}/frames"
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    for i in range(N_FILES):
        (
            spark.range(i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE, 1, 32)
            .select(
                (F.timestamp_seconds(1704067200 + (F.col("id") % 86400)))
                .alias("ts"),
                F.concat(
                    F.lit("openchirp/device/dev"),
                    (F.col("id") % 5000).cast("string"),
                    F.lit("/t"),
                    (F.col("id") % 7).cast("string"),
                ).alias("topic"),
                F.col("id").cast("string").alias("payload"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(f"{src}/f{i:02d}")
        )
    # flatten: the file source wants files in ONE dir; one parquet part
    # per staged file would under-fill batches, so move parts up with a
    # per-source-file prefix (40 ~250k-row parts total, consumed 4 per
    # trigger -> ~10 micro-batches of equal size. Batch COUNT is not
    # the contract — the boundary-crossing exactly-once is).
    flat = f"{BASE}/src"
    os.makedirs(flat, exist_ok=True)
    n = 0
    for i in range(N_FILES):
        d = f"{src}/f{i:02d}"
        for p in sorted(os.listdir(d)):
            if p.endswith(".parquet"):
                os.rename(f"{d}/{p}", f"{flat}/{i:02d}_{n:04d}.parquet")
                n += 1
    shutil.rmtree(src, ignore_errors=True)


def progress_rows(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        if p is None:
            continue
        out.append({"batchId": p["batchId"],
                    "numInputRows": p["numInputRows"]})
    return out


def main() -> int:
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.streaming import ingest as st

    spark = get_spark("stress_ingest_mb")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    t0 = time.time()
    stage(spark)
    t_stage = time.time() - t0

    out_dir, ckpt = f"{BASE}/out", f"{BASE}/ckpt"
    total = N_FILES * ROWS_PER_FILE
    row: dict = {
        "staged_msgs": total,
        "files": N_FILES,
        "max_files_per_trigger": 4,
        "stage_sec": round(t_stage, 1),
    }

    # phase 1: availableNow replay, 4 files (~1M rows) per micro-batch;
    # kill after >= 3 completed batches — mid-replay, between batch
    # boundaries
    src_stream = st.mqtt_file_stream(spark, f"{BASE}/src",
                                     max_files_per_trigger=4)
    t0 = time.time()
    q = st.start_ingest(spark, f"{BASE}/src", out_dir, ckpt,
                        source=src_stream)
    while True:
        done = [p for p in q.recentProgress
                if p is not None and p["numInputRows"] > 0]
        if len(done) >= 3:
            q.stop()
            break
        if not q.isActive:
            break
        time.sleep(0.2)
    q.awaitTermination()
    st.stop_all(spark)
    phase1 = progress_rows(q)
    row["phase1_batches"] = phase1
    row["phase1_killed_after_sec"] = round(time.time() - t0, 1)

    # phase 2: restart on the SAME checkpoint; availableNow drains the
    # remainder. Exactly-once: the checkpoint must resume at the file
    # boundary, re-emitting nothing.
    src_stream = st.mqtt_file_stream(spark, f"{BASE}/src",
                                     max_files_per_trigger=4)
    t0 = time.time()
    q = st.start_ingest(spark, f"{BASE}/src", out_dir, ckpt,
                        source=src_stream)
    q.awaitTermination()
    st.stop_all(spark)
    row["phase2_batches"] = progress_rows(q)
    row["phase2_sec"] = round(time.time() - t0, 1)

    sink = spark.read.parquet(f"{out_dir}/points")
    n_rows = sink.count()
    # the numeric payload coerces to value_double (float-first union,
    # influx_service.py:163-181 semantics) — that double IS the unique
    # frame sequence id
    n_distinct = sink.selectExpr(
        "count(DISTINCT value_double) AS d").collect()[0]["d"]
    row["sink_rows"] = n_rows
    row["sink_distinct_frames"] = n_distinct
    row["duplicates"] = n_rows - n_distinct
    row["missing"] = total - n_distinct
    row["exactly_once"] = (n_rows == total) and (n_distinct == total)
    row["throughput_msgs_per_sec"] = round(
        total / (row["phase1_killed_after_sec"] + row["phase2_sec"]))

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["ingest_multibatch"] = row
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    shutil.rmtree(BASE, ignore_errors=True)
    return 0 if row["exactly_once"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
