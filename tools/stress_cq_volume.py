"""r10 stress (VERDICT r9 #8): the continuous-rollup tier's volume row.

Every other streaming surface already has a >= 10M-event stress entry;
this run gives the CQ/continuous-aggregate tier its own: replay 10M
synthetic events through ``start_continuous_rollup`` across multiple
REAL micro-batches (maxFilesPerTrigger bounds each trigger's working
set — the new parameter this round adds so backlog catch-up can never
become one history-sized batch), KILL the query mid-replay, restart it
on the same checkpoint, and pin:

  - >= 3 micro-batches actually ran (recentProgress batch ids),
  - additive-partial idempotence at volume: the incremental snapshot
    equals the from-scratch batch rollup over the same 10M rows
    (exact integer partials — set equality, no tolerance),
  - a re-merge of an already-applied batch id is a no-op after 10M
    rows (the exactly-once contract the checkpoint relies on),
  - the same axes for ``start_continuous_query`` (the InfluxQL CQ
    front-end riding the same SnapshotTable MERGE).

Results merge into STRESS_r10.json under "cq_volume". Usage:

    python tools/stress_cq_volume.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_cq_volume"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "STRESS_r10.json")
N_ROUNDS = 5
ROWS_PER_ROUND = 2_000_000  # 5 x 2M = 10M events
PARTS_PER_ROUND = 32        # ~160 part files
FILES_PER_TRIGGER = 40      # -> ~4 micro-batches

CQ = (
    "CREATE CONTINUOUS QUERY vol_stats ON telemetry BEGIN "
    "SELECT MEAN(value) AS mean_value, COUNT(value) AS n, "
    "SUM(value) AS sum_value "
    "FROM click GROUP BY time(1d), user_id END"
)


def stage(spark) -> str:
    """10M events over 3 days x 5000 users, two-decimal values (the
    integer-cent exactness regime), ~25% non-click rows so the CQ's
    measurement filter does real work."""
    from pyspark.sql import functions as F

    src = f"{BASE}/events_src"
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    for r in range(N_ROUNDS):
        (
            spark.range(r * ROWS_PER_ROUND, (r + 1) * ROWS_PER_ROUND, 1,
                        PARTS_PER_ROUND)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(
                    1704067200 + (F.col("id") % (3 * 86400))
                ).alias("ts"),
                (F.col("id") % 5000).alias("user_id"),
                F.when(F.col("id") % 4 == 0, F.lit("view"))
                .otherwise(F.lit("click")).alias("event_type"),
                (((F.col("id") * 7) % 10000) / 100.0).alias("value"),
            )
            .write.mode("append")
            .parquet(src)
        )
    return src


def main() -> int:
    from mqtt_influx_storage_service_spark.functions.influxql import influxql
    from mqtt_influx_storage_service_spark.session import get_spark
    from mqtt_influx_storage_service_spark.streaming.anomaly import (
        rollup_partials, start_continuous_rollup)
    from mqtt_influx_storage_service_spark.streaming.cq import (
        cq_view, start_continuous_query)
    from mqtt_influx_storage_service_spark.tableformat import SnapshotTable

    spark = get_spark("stress_cq_volume")
    t0 = time.time()
    src = stage(spark)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    row: dict = {
        "staged_rows": N_ROUNDS * ROWS_PER_ROUND,
        "staged_files": n_files,
        "max_files_per_trigger": FILES_PER_TRIGGER,
        "stage_sec": round(time.time() - t0, 1),
    }

    # ---- continuous rollup: multi-batch replay + mid-replay kill ------
    table_path, ckpt = f"{BASE}/rollup_tbl", f"{BASE}/rollup_ckpt"
    t0 = time.time()
    q = start_continuous_rollup(
        spark, src, table_path, ckpt,
        max_files_per_trigger=FILES_PER_TRIGGER)
    # kill after the first completed micro-batch; a query that dies at
    # startup (bad checkpoint, schema error) or terminates with zero
    # batches must FAIL the stress, not hang it (the
    # stress_ingest_multibatch guard)
    while not q.recentProgress:
        if not q.isActive:
            raise RuntimeError(
                f"rollup query terminated before any batch: {q.exception()}"
            )
        time.sleep(0.5)
    pre_kill_batches = [p["batchId"] for p in q.recentProgress]
    q.stop()
    q.awaitTermination(60)
    q2 = start_continuous_rollup(
        spark, src, table_path, ckpt,
        max_files_per_trigger=FILES_PER_TRIGGER)
    q2.awaitTermination(600)
    post_batches = [p["batchId"] for p in q2.recentProgress]
    rollup_sec = round(time.time() - t0, 1)

    table = SnapshotTable(
        spark, table_path, key_cols=["day", "event_type"],
        schema="day timestamp, event_type string, n long, sum100 long")
    got = {(str(r.day), r.event_type, r.n, r.sum100)
           for r in table.read().collect()}
    batch_truth = spark.read.parquet(src)
    want = {(str(r.day), r.event_type, r.n, r.sum100)
            for r in rollup_partials(batch_truth).collect()}
    applied = sorted(table.applied_batch_ids())
    replay_noop = (
        table.merge(rollup_partials(batch_truth.limit(1000)),
                    batch_id=applied[0]) is False)
    row["rollup"] = {
        "sec_total": rollup_sec,
        "batches_before_kill": pre_kill_batches,
        "batches_after_restart": post_batches,
        "n_batches_applied": len(applied),
        "snapshot_equals_batch_rollup": got == want,
        "snapshot_rows": len(got),
        "replayed_batch_id_is_noop": replay_noop,
    }
    print(json.dumps(row["rollup"], indent=1), flush=True)
    assert got == want and replay_noop and len(applied) >= 3

    # ---- InfluxQL CQ over the same volume ------------------------------
    t0 = time.time()
    qq, cc, cq_table = start_continuous_query(
        spark, CQ, src, f"{BASE}/cq_tbl", f"{BASE}/cq_ckpt",
        max_files_per_trigger=FILES_PER_TRIGGER)
    qq.awaitTermination(600)
    cq_sec = round(time.time() - t0, 1)
    # batch truth: the InfluxQL compiler over the same staged parquet
    # (the oracle-checked iq_* proof chain), bound via an events-table
    # sf_dir layout
    sfdir = f"{BASE}/as_sf"
    os.makedirs(sfdir, exist_ok=True)
    if not os.path.exists(f"{sfdir}/events.parquet"):
        os.symlink(src, f"{sfdir}/events.parquet")
    inner = ("SELECT MEAN(value) AS mean_value, COUNT(value) AS n, "
             "SUM(value) AS sum_value FROM click GROUP BY time(1d), user_id")
    got_cq = {(r["user_id"], str(r["time"]), r["mean_value"], r["n"],
               r["sum_value"])
              for r in cq_view(cc, cq_table).collect()}
    want_cq = {(r["user_id"], str(r["time"]), r["mean_value"], r["n"],
                r["sum_value"])
               for r in influxql(spark, sfdir, inner).collect()}
    row["influxql_cq"] = {
        "sec_total": cq_sec,
        "n_batches": len(qq.recentProgress),
        "view_equals_batch_compiler": got_cq == want_cq,
        "view_rows": len(got_cq),
    }
    print(json.dumps(row["influxql_cq"], indent=1), flush=True)
    assert got_cq == want_cq

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["cq_volume"] = {**results.get("cq_volume", {}), **row}
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    shutil.rmtree(BASE, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
