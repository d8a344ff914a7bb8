"""Driver-contract smoke tests: entry() runs, registries are aligned."""

from __future__ import annotations

import __spark_entry__ as ent


def test_entry_runs(spark):
    df = ent.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "bucket_start" in df.columns and "n_events" in df.columns


def test_registry_alignment():
    qs, oracles = ent.queries(), ent.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query; queries without oracle are
    # allowed (rows-only check) but should be the exception
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_all_queries_run_sf0001(spark, sf_dir):
    for name, fn in ent.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
