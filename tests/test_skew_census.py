"""Unit pins for the task-skew census (tools/skew_census.py): the
stage-audit math and the flag decision must stay deterministic — the
census's "0 flagged" evidence row (STRESS_r10 `skew_census`) is only as
trustworthy as these thresholds, so a silent loosening (or a quantile
mix-up that reads median where max belongs) has to fail a test, not a
judge. No Spark session: the REST fetch is stubbed the way the status
store answers."""

from __future__ import annotations

import importlib.util
import os
import sys

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "skew_census.py")
spec = importlib.util.spec_from_file_location("skew_census", _TOOL)
skew_census = importlib.util.module_from_spec(spec)
sys.modules["skew_census"] = skew_census
spec.loader.exec_module(skew_census)


def _summary(dur, spill=(0, 0, 0), write=(0, 0, 0)):
    return {
        "duration": list(dur),
        "memoryBytesSpilled": list(spill),
        "shuffleWriteMetrics": {"writeBytes": list(write)},
    }


def _stage(tasks=32, stage_id=7, attempt=0, name="x"):
    return {"stageId": stage_id, "attemptId": attempt,
            "numCompleteTasks": tasks, "name": name}


def _audit(stage, summary, monkeypatch):
    monkeypatch.setattr(skew_census, "_get", lambda base, path: summary)
    return skew_census._audit_stage("http://stub", stage)


def test_small_stages_carry_no_parallelism_signal(monkeypatch):
    # below MIN_TASKS (now 1 — ADVICE r10) only a 0-task stage is
    # skipped; it has nothing to measure
    row = _audit(_stage(tasks=skew_census.MIN_TASKS - 1),
                 _summary((0, 5_000, 50_000)), monkeypatch)
    assert row is None


def test_single_task_stage_reaches_collapse_detector(monkeypatch):
    """ADVICE r10: a 1-task stage (unsplittable input, global sort
    coalesced to one task) must flow through to the ABSOLUTE collapse
    check — its signal needs no distribution — while staying invisible
    to the ratio detector (p50 == max at n=1)."""
    row = _audit(_stage(tasks=1),
                 _summary((60_000, 60_000, 60_000)), monkeypatch)
    assert row is not None and row["tasks"] == 1 and row["ratio"] == 1.0
    assert skew_census._flag_reason(row) == "parallelism-collapse"
    # a short 1-task stage is just a small stage, not collapse
    fast = _audit(_stage(tasks=1),
                  _summary((2_000, 2_000, 2_000)), monkeypatch)
    assert fast is not None and not skew_census._is_flagged(fast)


def test_settle_waits_for_active_stages_to_drain(monkeypatch):
    """ADVICE r10: a stable completed count alone is not settled — a
    paused listener queue can hold it stable while the final stage is
    still active. _settle must also require the active list empty."""
    calls = {"n": 0}

    def _fake(base, path):
        calls["n"] += 1
        # completed count stable at 5 from the start; one stage stays
        # active for the first 4 fetches (2 poll rounds)
        if "active" in path:
            return [{"stageId": 9}] if calls["n"] < 5 else []
        return [{"stageId": i} for i in range(5)]

    monkeypatch.setattr(skew_census, "_get", _fake)
    monkeypatch.setattr(skew_census.time, "sleep", lambda s: None)
    skew_census._settle("http://stub", timeout_s=5.0)
    # returned only after the active list drained, not on the first
    # stable completed read
    assert calls["n"] >= 5


def test_subsecond_max_task_is_noise(monkeypatch):
    row = _audit(_stage(), _summary((10, 80, skew_census.MIN_MAX_MS - 1)),
                 monkeypatch)
    assert row is None


def test_ratio_reads_max_over_median_not_min(monkeypatch):
    # quantiles arrive as [p0, p50, p100]; a mix-up that divides by p0
    # would report 500x here instead of 10x
    row = _audit(_stage(), _summary((10, 500, 5_000),
                                    spill=(0, 0, 123),
                                    write=(1, 2, 3)), monkeypatch)
    assert row is not None
    assert row["ratio"] == 10.0
    assert row["med_ms"] == 500 and row["max_ms"] == 5_000
    assert row["spill_max"] == 123
    assert (row["shuffle_write_med"], row["shuffle_write_max"]) == (2, 3)


def test_zero_median_is_infinite_ratio_not_crash(monkeypatch):
    row = _audit(_stage(), _summary((0, 0, 4_000)), monkeypatch)
    assert row is not None and row["ratio"] == float("inf")


def test_evicted_stage_is_skipped_not_fatal(monkeypatch):
    def _raise(base, path):
        raise OSError("status store evicted the stage")
    monkeypatch.setattr(skew_census, "_get", _raise)
    assert skew_census._audit_stage("http://stub", _stage()) is None


def test_straggler_flag_needs_extreme_material_and_wide():
    base = {"ratio": skew_census.RATIO_FLAG,
            "max_ms": skew_census.MIN_FLAG_MS,
            "tasks": skew_census.RATIO_MIN_TASKS}
    assert skew_census._flag_reason(dict(base)) == "straggler"
    assert not skew_census._is_flagged(
        dict(base, ratio=skew_census.RATIO_FLAG - 0.01))
    assert not skew_census._is_flagged(
        dict(base, max_ms=skew_census.MIN_FLAG_MS - 1))
    # below RATIO_MIN_TASKS the median IS the max (Spark's p50 on a
    # 2-task stage), so the ratio statistic is void there
    assert not skew_census._is_flagged(
        dict(base, tasks=skew_census.RATIO_MIN_TASKS - 1))


def test_collapse_flag_catches_aqe_coalesced_hot_key():
    # the r10 selftest shape: AQE coalesces the skewed shuffle to 2
    # tasks, one giant — ratio reads 1.0, collapse must still flag
    row = {"ratio": 1.0, "tasks": 2, "max_ms": skew_census.COLLAPSE_MS}
    assert skew_census._flag_reason(row) == "parallelism-collapse"
    # a wide stage with big balanced tasks is real work, not collapse
    assert not skew_census._is_flagged(
        dict(row, tasks=skew_census.COLLAPSE_TASKS + 1))
    # a narrow stage with fast tasks is a small stage, not collapse
    assert not skew_census._is_flagged(
        dict(row, max_ms=skew_census.COLLAPSE_MS - 1))


def test_stage_rows_attribute_each_stage_once(monkeypatch):
    stages = [_stage(stage_id=1), _stage(stage_id=2)]
    monkeypatch.setattr(skew_census, "_get", lambda base, path: stages)
    seen: set = set()
    first = skew_census._stage_rows("http://stub", seen)
    assert [s["stageId"] for s in first] == [1, 2]
    # the same completed stages must not re-attribute to the next query
    assert skew_census._stage_rows("http://stub", seen) == []
