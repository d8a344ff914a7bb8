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

`--selftest` is the census's true-positive canary: the registry rows
all read "0 flagged", which is only evidence if the census CAN flag —
so the selftest runs a deliberately hot-keyed window (90% of rows on
one partition key, a shape AQE cannot split) under BOTH detector
shapes (AQE-coalesced narrow stage → parallelism-collapse; coalescing
disabled → wide-stage straggler) and exits nonzero unless both flag.
The engine's own window tier survives the skewed-events fixture
balanced (the r8 skew-safe twins), which is exactly why the canary
has to manufacture the pathology.

Each query row also records per-query shuffle-volume accounting
(input/shuffle-read/shuffle-write byte totals off the stage rows) and
the summary ranks the top shuffle-write:input ratios — at 100 TB the
shuffle is the cost driver, and a query writing far more shuffle than
it reads input is paying for a plan shape the sf0.1 suite seconds
never surface.

Usage:
    python tools/skew_census.py [query_name ...] [--sf DIR]
        [--json OUT] [--port N] [--selftest]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIN_TASKS = 1          # ADVICE r10: 1-task stages DO reach the audit —
                       # they carry no distribution (ratio detector
                       # needs RATIO_MIN_TASKS anyway) but a single
                       # unsplittable 10s+ task IS the purest
                       # parallelism collapse, and the absolute
                       # detector's signal needs no distribution
MIN_MAX_MS = 1_000     # ignore stages whose slowest task is sub-second

# Detector 1 — STRAGGLER: one task far beyond the stage's median. Only
# meaningful on stages wide enough for the median to be a "typical
# task" (at n=2 Spark's p50 quantile IS the max, so the ratio reads
# 1.0 on a 2-task stage where one task holds 90% of the data — the r10
# selftest caught exactly that blindness).
RATIO_FLAG = 8.0       # max/median at or above this is a straggler shape
MIN_FLAG_MS = 3_000    # ...but only if the straggler itself is material
RATIO_MIN_TASKS = 5    # ...and the median means something

# Detector 2 — PARALLELISM COLLAPSE: AQE coalesces a skewed shuffle's
# many small partitions into FEW tasks, so the classic hot-agg-key /
# hot-window-key stage arrives as 2-3 tasks, one of them giant — no
# ratio statistic survives that. The signal is absolute: a stage
# running a multi-second task while using a fraction of the box's
# parallelism. Wide balanced stages with big tasks (32 x 10 s of real
# work) are NOT collapse; a <=COLLAPSE_TASKS-task stage with a
# >=COLLAPSE_MS task on a 32-core box is.
COLLAPSE_MS = 10_000
COLLAPSE_TASKS = 8     # cores/4 on the local[32] bench box


def _flag_reason(row: dict) -> str | None:
    """The straggler shape (wide stage, one task >> median) or the
    collapse shape (narrow stage, one giant task); None if neither."""
    if (row["tasks"] >= RATIO_MIN_TASKS
            and row["ratio"] >= RATIO_FLAG
            and row["max_ms"] >= MIN_FLAG_MS):
        return "straggler"
    if row["tasks"] <= COLLAPSE_TASKS and row["max_ms"] >= COLLAPSE_MS:
        return "parallelism-collapse"
    return None


def _is_flagged(row: dict) -> bool:
    return _flag_reason(row) is not None


# --isolate classifier thresholds: a straggler whose slowest task did
# <= 2x the median task's WORK is time-skewed without being
# work-skewed — the co-scheduling shape; >= 4x work is real data skew.
WORK_BALANCED_MAX = 2.0
WORK_SKEWED_MIN = 4.0
# Concentrated-but-BOUNDED work is its own class: predicate-pushdown
# row-group pruning, limits, and recursion floors put ALL of a small
# relation in one task (work ratio reads huge because the other tasks
# read nothing), but the absolute work does not grow with the corpus —
# the r13 brp finding: the query side's 2 pruned row groups (32768
# records) in one task, duration inflated 0.3 s -> 17 s by
# co-scheduling against the corpus-side stages of the SAME query.
# Below this record floor a work-concentrated straggler is classified
# structural-bounded, not data skew.
WORK_MATERIAL_MIN = 1_000_000
ISOLATE_REPS = 3


def _classify_flag(row: dict) -> str:
    """Adjudicate a flagged stage from its own metrics (VERDICT r12
    #3). Stage-SEQUENTIAL execution is not reachable through public
    conf in one JVM — AQE materializes every ready exchange through an
    unconfigurable 16-thread pool, and FIFO task scheduling only
    orders resource offers, so independent stages always overlap at
    their tails. The automated adjudication therefore measures the
    signal that actually separates the hypotheses: per-task WORK
    (records processed) vs DURATION. Data skew is deterministic in
    work; co-scheduling contention inflates time over balanced work.
    Collapse flags are structural (task counts can't be faked by
    contention) and classify as themselves."""
    reason = _flag_reason(row)
    if reason == "parallelism-collapse":
        return "parallelism-collapse (structural)"
    wr = row.get("work_ratio")
    if wr is None:
        return "unclassified (no work metrics on this stage)"
    if wr <= WORK_BALANCED_MAX:
        return ("co-scheduling-artifact (duration ratio "
                f"{row['ratio']} over work ratio {wr} — the slowest "
                "task did median work slowly)")
    if wr >= WORK_SKEWED_MIN:
        if row.get("work_max_records", 0) < WORK_MATERIAL_MIN:
            return (
                "structural-bounded (all "
                f"{row['work_max_records']} records in one task — "
                "pushdown-pruned/limit/recursion-floor shape, work "
                "does not scale with the corpus; duration beyond the "
                "solo cost is co-scheduling)"
            )
        return f"data-skew (work ratio {wr})"
    return f"ambiguous (work ratio {wr})"


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


def _settle(base: str, timeout_s: float = 6.0) -> None:
    """The status store applies listener events asynchronously — a
    query's FINAL stage (often the one with the straggler) can list as
    running for a beat after the action returns, and auditing too early
    both misses it and mis-attributes it to the NEXT query. Poll until
    the completed-stage count is stable across two reads AND no stage
    is still listed active (ADVICE r10: a listener queue pausing longer
    than one poll interval can hold the completed count stable while
    the final stage is still in flight — the active list catches
    exactly that)."""
    prev = -1
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            n = len(_get(base, "/stages?status=complete"))
            active = len(_get(base, "/stages?status=active"))
        except Exception:
            n, active = -2, 1
        if n == prev and active == 0:
            return
        prev = n
        time.sleep(0.3)


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
    # Per-task WORK quantiles (records in: file scan + shuffle read) —
    # the signal that separates the two straggler hypotheses: a
    # DATA-skew straggler processes more records than the median task
    # (deterministically, every run), while a co-scheduling artifact
    # (local[32] running a scan task alongside a 32-thread heavy
    # stage) takes longer on MEDIAN work. Quantile sums are per-metric
    # (max of sums != sum of maxes) — fine for a ratio heuristic, and
    # recorded so the adjudication is in the artifact, not in prose.
    im = ts.get("inputMetrics") or {}
    srm = ts.get("shuffleReadMetrics") or {}
    in_rec = im.get("recordsRead") or [0, 0, 0]
    sr_rec = srm.get("readRecords") or [0, 0, 0]
    work_med = float(in_rec[1]) + float(sr_rec[1])
    work_max = float(in_rec[2]) + float(sr_rec[2])
    # med clamps to 1: a 0-record median task with a busy max task is
    # the EXTREME of work skew (half the partitions empty, one full),
    # not a missing signal. Only a stage that moved no records at all
    # (pure compute) carries no work signal.
    work_ratio = (
        round(work_max / max(work_med, 1.0), 2) if work_max > 0 else None
    )
    return {
        "stage": s["stageId"],
        "tasks": s["numCompleteTasks"],
        "med_ms": round(d_med),
        "max_ms": round(d_max),
        "ratio": round(ratio, 2),
        "work_med_records": int(work_med),
        "work_max_records": int(work_max),
        "work_ratio": work_ratio,
        "spill_max": int(spill[2]),
        "shuffle_write_med": int(sw[1]),
        "shuffle_write_max": int(sw[2]),
        "name": (s.get("name") or "")[:80],
    }


def _selftest(spark, base: str) -> int:
    """Manufacture a straggler the census MUST flag: a window over a
    partition key holding 90% of 40M rows — one sort task carries 36M
    rows while 31 carry ~130k each. Run twice: with AQE coalescing ON
    the hot stage arrives as 2 tasks (the shape the COLLAPSE detector
    owns — Spark's p50 quantile equals the max at n=2, so the ratio
    reads 1.0), and with coalescing OFF the same data arrives as a
    WIDE stage with one giant task (the STRAGGLER detector's shape).
    A census that stays quiet on either would render the registry's
    "0 flagged" rows meaningless for that shape.

    Third shape (ADVICE r10): a SINGLE-task collapse — an unsplittable
    input or a global sort coalesced to one long task. n=1 carries no
    distribution at all, which is exactly why the old MIN_TASKS=2
    floor made this shape invisible; the absolute detector needs no
    distribution, so 1-task stages now flow through to it."""
    from pyspark.sql import functions as F

    def _hot_window():
        return (
            spark.range(40_000_000)
            .select(
                F.when(F.col("id") % 10 < 9, F.lit(0))
                .otherwise(F.col("id") % 32)
                .alias("k"),
                (F.col("id") % 1000).alias("v"),
            )
            .selectExpr(
                "k", "sum(v) over (partition by k order by v "
                "rows between unbounded preceding and current row) as s")
            .filter(F.col("s") < 0)
        )

    seen: set[tuple[int, int]] = set()
    failures = 0
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    for want, coalesce in (("parallelism-collapse", "true"),
                           ("straggler", "false")):
        spark.conf.set(coalesce_key, coalesce)
        _stage_rows(base, seen)  # absorb stages from the prior pass
        _hot_window().write.format("noop").mode("overwrite").save()
        _settle(base)
        rows = [r for s in _stage_rows(base, seen)
                if (r := _audit_stage(base, s))]
        hits = [dict(r, reason=_flag_reason(r)) for r in rows
                if _flag_reason(r) == want]
        if hits:
            f = hits[0]
            print(f"SELFTEST ok [{want}]: max {f['max_ms']} ms over "
                  f"{f['tasks']} tasks (ratio {f['ratio']})")
            if want == "straggler":
                # the isolate-mode classifier must see the manufactured
                # hot key as DATA skew (the straggler task really reads
                # ~36M records vs the ~130k median) — a classifier that
                # called this co-scheduling would adjudicate every real
                # skew away (VERDICT r12 #3 selftest extension)
                cls = _classify_flag(f)
                if cls.startswith("data-skew"):
                    print(f"SELFTEST ok [classify]: {cls}")
                else:
                    print(f"SELFTEST FAILED [classify]: manufactured "
                          f"work skew classified as {cls!r} (row {f})")
                    failures += 1
        else:
            worst = max(rows, key=lambda r: r["ratio"], default=None)
            print(f"SELFTEST FAILED [{want}]: not flagged; "
                  f"worst seen {worst}")
            failures += 1
    spark.conf.set(coalesce_key, "true")

    # single-task collapse: all 200M hash+agg rows in ONE task via
    # coalesce(1) — a 1-task, 10s+ stage the census must now see
    # (60M measured 4.1s on the bench box; 200M clears COLLAPSE_MS
    # with ~3x headroom)
    _stage_rows(base, seen)
    (
        spark.range(200_000_000)
        .coalesce(1)
        .select((F.xxhash64(F.col("id").cast("string")) % 1000).alias("h"))
        .agg(F.sum("h"))
        .write.format("noop").mode("overwrite").save()
    )
    _settle(base)
    rows = [r for s in _stage_rows(base, seen)
            if (r := _audit_stage(base, s))]
    hits = [r for r in rows
            if r["tasks"] == 1
            and _flag_reason(r) == "parallelism-collapse"]
    if hits:
        print(f"SELFTEST ok [single-task-collapse]: max "
              f"{hits[0]['max_ms']} ms over 1 task")
    else:
        print(f"SELFTEST FAILED [single-task-collapse]: not flagged; "
              f"rows {rows}")
        failures += 1
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", metavar="OUT")
    ap.add_argument("--port", type=int, default=4057)
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument(
        "--mem", default="8g",
        help="driver/executor heap for the census session (local mode: "
             "one JVM). The default matches the r12/r13 runs; the r14 "
             "100x isolate run needed 12g — the census's "
             "cumulative-cache protocol holds EVERY audited query's "
             "shared caches at once (a deliberately adversarial "
             "steady state no engine caller creates: bench and the "
             "driver release between queries), and the r14 persists "
             "(bm25 tf, MMR pool+picks, SemDeDup priority) raised "
             "that resident set past what an 8g heap leaves the "
             "jaccard grid verify's SMJ sorts")
    ap.add_argument(
        "--isolate", action="store_true",
        help="re-run every flagged query ISOLATE_REPS times solo and "
             "adjudicate each flag by work-vs-duration decomposition "
             "(data skew reproduces in WORK every rep; co-scheduling "
             "contention is time-only and intermittent)")
    args = ap.parse_args()

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
        .config("spark.driver.memory", args.mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # read the BOUND port from the context, not args.port: Spark bumps
    # the UI port with only a warning when the requested one is taken,
    # and a base URL pointing at the wrong port aborts the census
    # mid-sweep with an unhandled URLError after the staging work
    ui = spark.sparkContext.uiWebUrl or f"http://localhost:{args.port}"
    base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"

    if args.selftest:
        rc = _selftest(spark, base)
        spark.stop()
        return rc

    from tools import regimestamp

    qs = all_queries()
    names = args.names or list(qs)
    seen: set[tuple[int, int]] = set()
    census: dict[str, dict] = {}
    errors: dict[str, str] = {}
    # Machine-regime stamps (VERDICT r13 #4, shared module): the
    # census publishes walls, and r13 showed this box has a degraded
    # third regime where walls are unusable — stamp the window so the
    # artifact adjudicates itself.
    regime_start = regimestamp.stamp(spark)
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
        _settle(base)
        stages = []
        raw = _stage_rows(base, seen)
        for s in raw:
            row = _audit_stage(base, s)
            if row:
                stages.append(row)
        worst = max(stages, key=lambda r: r["ratio"], default=None)
        flagged = [dict(r, reason=_flag_reason(r)) for r in stages
                   if _is_flagged(r)]
        # shuffle-volume accounting straight off the stage rows: at
        # 100 TB the shuffle is the cost driver, and a query that
        # writes much more shuffle than it reads input is paying for a
        # plan shape (re-keying wide rows, pre-aggregation misses)
        # that the suite seconds at sf0.1 will never surface
        io = {
            "input_bytes": sum(s.get("inputBytes") or 0 for s in raw),
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes") or 0 for s in raw),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes") or 0 for s in raw),
        }
        census[name] = {
            "wall_sec": round(wall, 2),
            "n_stages_audited": len(stages),
            "worst": worst,
            "flagged": flagged,
            "io": io,
            # EXECUTED partition counts for EVERY completed stage of
            # the query (VERDICT r13 #3): AQE re-plans partition
            # counts at runtime, and under co-scheduling memory
            # pressure it can coalesce differently than solo — the
            # r13 sweep saw a work-ratio-252 dedup_components task
            # that no solo rep reproduced, and without the per-stage
            # task counts the vanishing was unattributable. Stages
            # match across runs by NAME (ids are run-local).
            "stage_tasks": [
                {"stage": s["stageId"], "tasks": s["numCompleteTasks"],
                 "name": (s.get("name") or "")[:60]}
                for s in raw
            ],
        }
        tag = "FLAG" if flagged else "ok"
        wr = worst["ratio"] if worst else "-"
        print(f"[{i + 1}/{len(names)}] {tag:4s} {name}: worst ratio {wr} "
              f"({wall:.1f}s)", flush=True)

    flagged_q = {k: v["flagged"] for k, v in census.items() if v["flagged"]}

    isolate: dict[str, dict] = {}
    if args.isolate:
        # Adjudication reruns (VERDICT r12 #3): each flagged query runs
        # ISOLATE_REPS more times SOLO — nothing else on the box, the
        # caches in whatever steady state the sweep left them — and
        # every audited stage is classified by _classify_flag. A flag
        # that never reproduces as work-skew across the reps is pinned
        # a co-scheduling artifact IN the artifact, replacing the
        # manual per-round adjudication (STRESS_r11/r12 brp rows).
        # explicit names are adjudicated even when the sweep pass
        # happened not to flag them: the co-scheduling artifact is
        # intermittent by nature (that's the point of the reps)
        targets = {name: flagged_q.get(name, []) for name in args.names} \
            if args.names else flagged_q
        for name, flags in targets.items():
            reps = []
            for _ in range(ISOLATE_REPS):
                _stage_rows(base, seen)
                t0 = time.monotonic()
                try:
                    qs[name](spark, args.sf).write.format("noop") \
                        .mode("overwrite").save()
                except Exception as e:  # noqa: BLE001
                    reps.append({"error": str(e).splitlines()[0][:200]})
                    continue
                wall = time.monotonic() - t0
                _settle(base)
                raw_rep = _stage_rows(base, seen)
                rows = [r for s in raw_rep
                        if (r := _audit_stage(base, s))]
                rep_flags = [dict(r, reason=_flag_reason(r),
                                  classification=_classify_flag(r))
                             for r in rows if _is_flagged(r)]
                reps.append({"wall_sec": round(wall, 2),
                             "flagged": rep_flags,
                             # same per-stage executed partition counts
                             # as the sweep rows, so sweep-vs-solo AQE
                             # coalescing differences are in the
                             # artifact (VERDICT r13 #3)
                             "stage_tasks": [
                                 {"stage": s["stageId"],
                                  "tasks": s["numCompleteTasks"],
                                  "name": (s.get("name") or "")[:60]}
                                 for s in raw_rep
                             ]})
            classes = [f["classification"] for rep in reps
                       for f in rep.get("flagged", [])]
            data_skew = [c for c in classes if c.startswith("data-skew")]
            benign = ("co-scheduling", "structural-bounded")
            verdict = (
                "clean under isolation" if not classes
                else "data-skew (reproduced)" if data_skew
                else "co-scheduling artifact (no work-skew in any rep)"
                if all(c.startswith("co-scheduling") for c in classes)
                else "structural-bounded concentration (bounded work, "
                     "not corpus-scaling; residual duration is "
                     "co-scheduling)"
                if all(c.startswith(benign) for c in classes)
                else "mixed/ambiguous — read the rep rows"
            )
            isolate[name] = {
                "sweep_flags": [dict(f, classification=_classify_flag(f))
                                for f in flags],
                "reps": reps,
                "verdict": verdict,
            }
            print(f"ISOLATE {name}: {verdict}", flush=True)
    # top shuffle-to-input offenders (informational, min 64 MB written
    # so tiny queries' fixed-cost shuffles don't dominate the ranking)
    shuffle_top = sorted(
        ((k, v["io"]) for k, v in census.items()
         if v["io"]["shuffle_write_bytes"] >= 64 << 20),
        key=lambda kv: kv[1]["shuffle_write_bytes"]
        / max(1, kv[1]["input_bytes"]),
        reverse=True,
    )[:10]
    summary = {
        "shuffle_top10_by_write_to_input": [
            {"query": k,
             "write_mb": round(io["shuffle_write_bytes"] / 2**20, 1),
             "input_mb": round(io["input_bytes"] / 2**20, 1),
             "ratio": round(io["shuffle_write_bytes"]
                            / max(1, io["input_bytes"]), 2)}
            for k, io in shuffle_top
        ],
        "sf": args.sf,
        "thresholds": {"min_tasks": MIN_TASKS, "min_max_ms": MIN_MAX_MS,
                       "ratio_flag": RATIO_FLAG, "min_flag_ms": MIN_FLAG_MS,
                       "ratio_min_tasks": RATIO_MIN_TASKS,
                       "collapse_ms": COLLAPSE_MS,
                       "collapse_tasks": COLLAPSE_TASKS},
        "n_queries": len(census),
        "flagged": flagged_q,
        "errors": errors,
        "census": census,
    }
    if args.isolate:
        summary["isolate"] = isolate
        summary["isolate_thresholds"] = {
            "work_balanced_max": WORK_BALANCED_MAX,
            "work_skewed_min": WORK_SKEWED_MIN,
            "reps": ISOLATE_REPS,
        }
    regime_end = regimestamp.stamp(spark)
    summary["regime"] = {
        "start": regime_start,
        "end": regime_end,
        "drift_pct": regimestamp.drift_pct(
            regime_start["canary_sec"], regime_end["canary_sec"]),
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
