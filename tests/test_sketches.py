"""Tolerance tests for sketch-based aggregation (rel_sketches): the
approximate answers must sit within their advertised error of the
exact twins — the property the driver's rows-only check can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.operators.relational import rel_sketches
from mqtt_influx_storage_service_spark.sources import load_table


def test_hll_distinct_within_tolerance(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 5% of exact per group."""
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {r["event_type"]: r["approx_users"] for r in rel_sketches(spark, sf_dir).collect()}
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(0.05 * n, 2), (et, got[et], n)


def test_quantile_sketch_brackets_exact(spark, sf_dir):
    """percentile_approx(p) must fall between the exact p±2% quantiles
    (rank-error bound of the Greenwald-Khanna sketch)."""
    ev = load_table(spark, sf_dir, "events")
    sketch = {r["event_type"]: r for r in rel_sketches(spark, sf_dir).collect()}
    for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
        lo_p, hi_p = max(p - 0.02, 0.0), min(p + 0.02, 1.0)
        bounds = (
            ev.groupBy("event_type")
            .agg(
                F.expr(f"percentile(value, {lo_p})").alias("lo"),
                F.expr(f"percentile(value, {hi_p})").alias("hi"),
            )
            .collect()
        )
        for r in bounds:
            got = sketch[r["event_type"]][col]
            assert r["lo"] <= got <= r["hi"], (col, r["event_type"], got)
