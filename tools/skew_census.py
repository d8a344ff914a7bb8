"""Task-skew census: per-stage straggler audit across the full registry.

Why this axis matters at 100 TB: on a 1000-executor cluster a stage's
wall-clock is its SLOWEST task, not its mean. A query can be green at
sf0.1 and look fine in bench's suite seconds while one partition holds
10-100x the work of the median — exactly the shape that turns a
10-minute stage into a 10-hour straggler once real data skew (hot
devices, hot languages, boilerplate-heavy shards) meets real
parallelism. AQE's skew-join splitter only covers sort-merge JOIN
shuffle blocks; skewed AGGREGATION keys, skewed explode fan-out, and
skewed file splits are invisible to it. The broadcast census
(tools/broadcast_census.py, STRESS_r09) audited the plan's SHAPE; this
audits the plan's RUNTIME BALANCE, from the same source of truth the
Spark UI uses (the status-store REST API's per-stage task quantiles).

Method: one session with the UI enabled; each registered query runs to
a noop sink (full execution, no driver collect skew); stages that
completed during the run are attributed to the query; for every stage
with >= MIN_TASKS tasks and a max task >= MIN_MAX_MS, record the
max/median task-duration ratio plus spill and shuffle-write quantiles.

A stage is FLAGGED when max/median >= RATIO_FLAG and the max task is
>= MIN_FLAG_MS — i.e. the imbalance is both relatively extreme and
absolutely material. Small-stage noise (scheduler jitter on ~100 ms
tasks) is excluded by the floors, and single-task stages (global
sorts' final coalesce, driver-small dimension scans) carry no
parallelism signal so they are skipped.

Usage:
    python tools/skew_census.py [query_name ...] [--sf DIR]
        [--json OUT] [--port N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

MIN_TASKS = 4          # below this, "skew" is just scheduling
MIN_MAX_MS = 1_000     # ignore stages whose slowest task is sub-second
RATIO_FLAG = 8.0       # max/median at or above this is a straggler shape
MIN_FLAG_MS = 3_000    # ...but only if the straggler itself is material


def _is_flagged(row: dict) -> bool:
    """A straggler shape worth acting on: relatively extreme AND
    absolutely material (scheduler jitter on fast tasks is neither)."""
    return row["ratio"] >= RATIO_FLAG and row["max_ms"] >= MIN_FLAG_MS


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.load(r)


def _stage_rows(base: str, seen: set[tuple[int, int]]) -> list[dict]:
    """Completed stages not yet attributed to an earlier query."""
    out = []
    for s in _get(base, "/stages?status=complete"):
        key = (s["stageId"], s["attemptId"])
        if key in seen:
            continue
        seen.add(key)
        out.append(s)
    return out


def _audit_stage(base: str, s: dict) -> dict | None:
    if s["numCompleteTasks"] < MIN_TASKS:
        return None
    q = "quantiles=0.0,0.5,1.0"
    try:
        ts = _get(base, f"/stages/{s['stageId']}/{s['attemptId']}"
                        f"/taskSummary?{q}")
    except Exception:
        return None  # stage evicted from the status store
    dur = ts.get("duration") or [0, 0, 0]
    d_med, d_max = float(dur[1]), float(dur[2])
    if d_max < MIN_MAX_MS:
        return None
    spill = ts.get("memoryBytesSpilled") or [0, 0, 0]
    swm = ts.get("shuffleWriteMetrics") or {}
    sw = swm.get("writeBytes") or [0, 0, 0]
    ratio = d_max / d_med if d_med > 0 else float("inf")
    return {
        "stage": s["stageId"],
        "tasks": s["numCompleteTasks"],
        "med_ms": round(d_med),
        "max_ms": round(d_max),
        "ratio": round(ratio, 2),
        "spill_max": int(spill[2]),
        "shuffle_write_med": int(sw[1]),
        "shuffle_write_max": int(sw[2]),
        "name": (s.get("name") or "")[:80],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", metavar="OUT")
    ap.add_argument("--port", type=int, default=4057)
    args = ap.parse_args()

    import os
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", args.sf)
    from pyspark.sql import SparkSession

    from mqtt_influx_storage_service_spark.operators import all_queries
    from mqtt_influx_storage_service_spark.session import tune

    spark = tune(
        SparkSession.builder.master("local[32]")
        .appName("skew-census")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.port))
        .config("spark.ui.retainedStages", "20000")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = (f"http://localhost:{args.port}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}")

    qs = all_queries()
    names = args.names or list(qs)
    seen: set[tuple[int, int]] = set()
    census: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names):
        _stage_rows(base, seen)  # absorb stages from prior query's tail
        t0 = time.monotonic()
        try:
            qs[name](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 - census must finish the sweep
            errors[name] = str(e).splitlines()[0][:200]
            continue
        wall = time.monotonic() - t0
        time.sleep(0.2)  # let the status store settle
        stages = []
        for s in _stage_rows(base, seen):
            row = _audit_stage(base, s)
            if row:
                stages.append(row)
        worst = max(stages, key=lambda r: r["ratio"], default=None)
        flagged = [r for r in stages if _is_flagged(r)]
        census[name] = {
            "wall_sec": round(wall, 2),
            "n_stages_audited": len(stages),
            "worst": worst,
            "flagged": flagged,
        }
        tag = "FLAG" if flagged else "ok"
        wr = worst["ratio"] if worst else "-"
        print(f"[{i + 1}/{len(names)}] {tag:4s} {name}: worst ratio {wr} "
              f"({wall:.1f}s)", flush=True)

    flagged_q = {k: v["flagged"] for k, v in census.items() if v["flagged"]}
    summary = {
        "sf": args.sf,
        "thresholds": {"min_tasks": MIN_TASKS, "min_max_ms": MIN_MAX_MS,
                       "ratio_flag": RATIO_FLAG, "min_flag_ms": MIN_FLAG_MS},
        "n_queries": len(census),
        "flagged": flagged_q,
        "errors": errors,
        "census": census,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    print(f"\n{len(census)} queries audited, {len(flagged_q)} flagged, "
          f"{len(errors)} errors")
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
