"""Property tests (SURVEY.md §5 plan item 4, hypothesis).

Spark round-trips are expensive, so each property generates a BATCH of
cases per example and runs few examples — coverage comes from the
generated batch size, not the example count.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st_
from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark import streaming as st
from mqtt_influx_storage_service_spark.functions.coercion import coerce_payload

SETTINGS = dict(max_examples=5, deadline=None)


def _python_coerce(payload: str):
    """The INTENDED reference semantics (influx_service.py:163-181,
    float → bool → string; see SURVEY.md §1.2 on the py3 bytes/str
    divergence we do not replicate)."""
    try:
        return ("float", float(payload), None, None)
    except ValueError:
        pass
    if payload in ("true", "True"):
        return ("bool", None, True, None)
    if payload in ("false", "False"):
        return ("bool", None, False, None)
    return ("string", None, None, payload)


payloads = st_.one_of(
    st_.floats(allow_nan=False, allow_infinity=False).map(repr),
    st_.integers(-10**12, 10**12).map(str),
    st_.sampled_from(["true", "True", "false", "False", "TRUE", "tRue"]),
    st_.text(
        alphabet=st_.characters(codec="utf-8", exclude_categories=["Cs", "Cc"]),
        min_size=0,
        max_size=40,
    ),
)


@settings(**SETTINGS)
@given(st_.lists(payloads, min_size=1, max_size=150))
def test_coercion_total_and_matches_model(spark, batch):
    """Coercion is a TOTAL function (no nulls in value_type, exactly one
    value column set) and agrees with the reference's parse order."""
    df = spark.createDataFrame([(p,) for p in batch], "payload string")
    out = df.select("payload", coerce_payload(F.col("payload")).alias("v")).select(
        "payload", "v.value_type", "v.value_double", "v.value_bool", "v.value_str"
    )
    for row in out.collect():
        want_type, want_d, want_b, want_s = _python_coerce(row["payload"])
        got = (row["value_type"], row["value_double"], row["value_bool"], row["value_str"])
        if want_type == "float":
            # Spark try_cast accepts the same decimal/scientific forms
            # Python float() does for these generators
            assert got[0] == "float" and got[1] is not None
            assert abs(got[1] - want_d) <= 1e-9 * max(1.0, abs(want_d))
            assert got[2] is None and got[3] is None
        else:
            assert got == (want_type, want_d, want_b, want_s)
        # totality: discriminator always set, exactly one payload slot
        assert got[0] in ("float", "bool", "string")
        assert sum(x is not None for x in got[1:]) == (
            0 if row["payload"] is None else 1
        )


actions = st_.sampled_from(["new", "update", "delete"])
device_ids = st_.sampled_from([f"dev{i}" for i in range(6)])


@settings(**SETTINGS)
@given(
    st_.lists(
        st_.tuples(device_ids, actions), min_size=1, max_size=60
    ),
    st_.integers(1, 4),
)
def test_registry_cdc_converges_to_last_writer(spark, events, n_batches):
    """Replaying any event sequence through apply_cdc, in any batch
    partitioning, converges to the same state as a sequential dict
    replay (last-writer-wins; delete removes)."""
    model: dict[str, int] = {}
    for i, (dev, action) in enumerate(events):
        if action == "delete":
            model.pop(dev, None)
        else:
            model[dev] = i

    registry = spark.createDataFrame(
        [], "device_id string, registered_ts timestamp"
    )
    rows = [
        (f"2024-01-01 00:00:{i:02d}.{i%10}", action, dev)
        for i, (dev, action) in enumerate(events)
    ]
    # split into n contiguous batches, apply sequentially
    size = (len(rows) + n_batches - 1) // n_batches
    for b in range(0, len(rows), size):
        batch = spark.createDataFrame(
            rows[b : b + size], "ts string, action string, device_id string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        registry = st.apply_cdc(registry, batch)
        # keep lineage short: materialize intermediate state locally
        registry = spark.createDataFrame(
            registry.collect(), "device_id string, registered_ts timestamp"
        )
    got = {r["device_id"] for r in registry.collect()}
    assert got == set(model)


transducers = st_.sampled_from(["temp", "hum", "lux"])


@settings(**SETTINGS)
@given(
    st_.lists(
        st_.tuples(device_ids, transducers, st_.integers(0, 3),
                   st_.floats(-1e6, 1e6)),
        min_size=1,
        max_size=80,
        unique_by=lambda t: (t[0], t[1], t[2]),
    )
)
def test_dual_layout_roundtrip(spark, points):
    """Wide layout == pivot(narrow): every (device, ts, transducer)
    cell in the pivot equals the narrow row's value, and the pivot has
    exactly one row per (device, ts)."""
    rows = [
        (d, f"2024-01-01 00:0{m}:00", t, v) for (d, t, m, v) in points
    ]
    narrow = spark.createDataFrame(
        rows, "device_id string, ts string, transducer string, value_double double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    wide = st.wide_view(narrow)
    cells = {
        (r["device_id"], r["ts"], t): r[t]
        for r in wide.collect()
        for t in ["temp", "hum", "lux"]
        if t in wide.columns and r[t] is not None
    }
    expected = {
        (r["device_id"], r["ts"], r["transducer"]): r["value_double"]
        for r in narrow.collect()
    }
    assert cells == expected
    assert wide.count() == narrow.select("device_id", "ts").distinct().count()


def test_range_join_banded_equals_theta(spark):
    """The registered banded (equi-bucket + band filter) range join
    must produce exactly the rows of the broadcast-BNLJ theta form it
    replaced in the registry (the theta form stays as the reference
    implementation; only one spends a driver-gate slot)."""
    from mqtt_influx_storage_service_spark.operators.relational import (
        rel_range_join,
        rel_range_join_banded,
    )

    sf = "/root/testdata/sf0.001"
    theta = set(map(tuple, rel_range_join(spark, sf).collect()))
    banded = set(map(tuple, rel_range_join_banded(spark, sf).collect()))
    assert len(theta) > 0
    assert banded == theta


# --------------------------------------------------------------------------
# r4 recurrence family: engine == pure-Python model on random series
# --------------------------------------------------------------------------

series_values = st_.lists(
    st_.integers(-10**6, 10**6).map(lambda c: c / 100.0),
    min_size=2,
    max_size=120,
)


def _write_series(spark, values):
    """One-series events table from a value list, written to a fresh
    temp dir (hypothesis reuses fixtures across examples)."""
    import datetime as dt
    import tempfile

    import pandas as pd

    d = tempfile.mkdtemp(prefix="prop_series_")
    base = dt.datetime(2024, 1, 1)
    pd.DataFrame(
        [
            (i, base + dt.timedelta(minutes=7 * i), 1, "click", v, "{}")
            for i, v in enumerate(values)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d + "/events.parquet")
    return d


@settings(**SETTINGS)
@given(series_values)
def test_cumulative_sum_matches_prefix_model(spark, values):
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_cumulative_sum,
    )

    d = _write_series(spark, values)
    got = [
        r.cumulative
        for r in ts_cumulative_sum(spark, d).orderBy("ts", "event_id").collect()
    ]
    acc, want = 0, []
    for v in values:
        acc += round(v * 100)
        want.append(acc / 100.0)
    assert got == want


@settings(**SETTINGS)
@given(series_values)
def test_cumulative_sum_chunked_equals_plain(spark, values):
    """The r8 skew-safe twin is exact on arbitrary series: the
    day-chunked prefix-sum decomposition returns bit-identical rows to
    the single-window form (7-minute spacing makes longer lists span
    multiple calendar-day chunks, exercising the offset join)."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_cumulative_sum,
        ts_cumulative_sum_chunked,
    )

    d = _write_series(spark, values)
    plain = ts_cumulative_sum(spark, d).orderBy("ts", "event_id").collect()
    chunk = ts_cumulative_sum_chunked(spark, d).orderBy(
        "ts", "event_id"
    ).collect()
    assert [r.cumulative for r in plain] == [r.cumulative for r in chunk]


@settings(**SETTINGS)
@given(series_values)
def test_percentile_twophase_equals_exact(spark, values):
    """The two-phase (counting) percentile returns the same nearest-rank
    VALUES as the row-ranking form on arbitrary series — including tied
    values, where the boundary row differs but the value cannot."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_percentile,
        ts_percentile_twophase,
    )

    d = _write_series(spark, values)
    a = ts_percentile(spark, d).collect()[0]
    b = ts_percentile_twophase(spark, d).collect()[0]
    assert (a.n_points, a.p50_value, a.p95_value) == (
        b.n_points, b.p50_value, b.p95_value
    )


@settings(**SETTINGS)
@given(series_values)
def test_holt_winters_matches_python_fold(spark, values):
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        HW_ALPHA,
        HW_BETA,
        HW_LOOKBACK,
        ts_holt_winters,
    )

    d = _write_series(spark, values)
    row = ts_holt_winters(spark, d).collect()[0]
    xs = values[-HW_LOOKBACK:]
    l, b = xs[1], xs[1] - xs[0]
    for x in xs[2:]:
        nl = HW_ALPHA * x + (1 - HW_ALPHA) * (l + b)
        b = HW_BETA * (nl - l) + (1 - HW_BETA) * b
        l = nl
    assert row.n_fit == len(xs)
    assert row.level == l and row.trend == b  # bit-exact, raw doubles
    assert row.fc_2 == l + 2.0 * b


@settings(**SETTINGS)
@given(series_values)
def test_counter_rate_matches_reset_model(spark, values):
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_counter_rate,
    )

    d = _write_series(spark, values)
    rows = ts_counter_rate(spark, d).collect()
    got_inc = round(sum(r.increase for r in rows), 2)
    got_resets = sum(r.n_resets for r in rows)
    cents = [round(v * 100) for v in values]
    inc = resets = 0
    for prev, cur in zip(cents, cents[1:]):
        if cur >= prev:
            inc += cur - prev
        else:
            inc += cur
            resets += 1
    assert got_inc == round(inc / 100.0, 2)
    assert got_resets == resets
    assert sum(r.n_samples for r in rows) == len(values) - 1


# --- dedup_substring vs a brute-force O(n²) python model -------------------

# small alphabet so cross-document window collisions actually occur
corpus_docs = st_.lists(
    st_.lists(st_.sampled_from("abcd"), min_size=1, max_size=40).map(
        lambda ws: " ".join(ws)
    ),
    min_size=2,
    max_size=8,
)


@settings(**SETTINGS)
@given(corpus_docs)
def test_substring_dedup_matches_bruteforce(spark, texts):
    """dedup_substring (K=4 here via synthetic docs of single-char
    tokens... the operator's K is fixed, so the model recomputes with
    SUBSTR_TOKENS) equals the quadratic reference: for every doc,
    enumerate its K-token windows, mark those appearing verbatim in
    ANY other doc, and take the longest consecutive marked run."""
    import tempfile

    from mqtt_influx_storage_service_spark.operators.dedup import (
        SUBSTR_TOKENS as K,
        dedup_substring,
    )

    d = tempfile.mkdtemp(prefix="substr_prop_")
    import pandas as pd

    # stretch tokens so docs reach K: repeat each token list cyclically
    docs = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        ws = (ws * ((K + 10) // len(ws) + 1))[: len(ws) + K + 3]
        docs.append((i, " ".join(ws)))
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        d + "/documents.parquet"
    )

    def windows(ws):
        return [tuple(ws[i : i + K]) for i in range(len(ws) - K + 1)]

    toks = {i: t.split(" ") for i, t in docs}
    wins = {i: windows(ws) for i, ws in toks.items()}
    owners = {}
    for i, wl in wins.items():
        for w in set(wl):
            owners.setdefault(w, set()).add(i)
    want = {}
    for i, wl in wins.items():
        dup = [len(owners[w]) > 1 for w in wl]
        run = best = 0
        for m in dup:
            run = run + 1 if m else 0
            best = max(best, run)
        want[i] = (
            len(wl),
            sum(dup),
            best + K - 1 if best else 0,
        )
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.max_dup_span)
        for r in dedup_substring(spark, d).collect()
    }
    assert got == want


@given(
    st_.lists(
        st_.lists(
            st_.floats(min_value=-1.0, max_value=1.0,
                       allow_nan=False, allow_infinity=False),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=48,
    ),
    st_.floats(min_value=0.1, max_value=0.95),
    st_.integers(min_value=1, max_value=7),
)
@settings(max_examples=40, deadline=None)
def test_semdedup_kernel_matches_quadratic_reference(vecs, eps, chunk):
    """Property pin for the r12-verified above-gate SemDeDup kernel
    (`_semdedup_list_verdicts`): on ARBITRARY vector lists, eps values
    and chunk sizes (including chunk < list size, forcing multiple
    blockwise-GEMM tiles), the kernel's verdicts must equal the naive
    O(n²) within-cluster rule — sort by (cos_c, vec_id), drop a row
    iff ANY earlier row is a round-6 eps-neighbor, dropped or not.
    Pure-driver property (no Spark): the fixture test pins the
    distributed path; this pins the kernel math across the input space
    the fixture cannot reach (ties, zero vectors, tiny chunks)."""
    import numpy as np
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.dedup import (
        _semdedup_list_verdicts,
    )

    n = len(vecs)
    X = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    U = X / np.where(norms == 0, 1.0, norms)
    # priority key replicates _ivf_priority_udf's shape: any float is
    # valid, INCLUDING duplicates (ties fall to the vec_id tiebreak)
    cos_c = np.round(U[:, 0], 6)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64) * 7,  # sparse ids
            "cl": np.zeros(n, dtype=np.int64),
            "cos_c": cos_c,
            "emb": [list(map(float, v)) for v in vecs],
        }
    )
    got = _semdedup_list_verdicts(eps, chunk=chunk)(pdf)
    got_kept = dict(zip(got["vec_id"], got["kept"]))

    order = sorted(range(n), key=lambda i: (cos_c[i], i * 7))
    expect = {}
    for pos, i in enumerate(order):
        dropped = any(
            float(np.round(U[i] @ U[j], 6)) >= eps
            for j in order[:pos]
        )
        expect[i * 7] = not dropped
    assert got_kept == expect


@given(
    st_.integers(min_value=0, max_value=2**32 - 1),
    st_.integers(min_value=2, max_value=12),
    st_.integers(min_value=16, max_value=96),
)
@settings(max_examples=25, deadline=None)
def test_lloyd_pairs_bit_identical_to_broadcast_form(seed, k, m):
    """Property extension of the fixture Lloyd-parity pin (ADVICE r11):
    the matmul-form `_lloyd_pairs` must reproduce the
    broadcast-difference-form `mlops._lloyd` BIT-FOR-BIT on random
    unit-vector samples across seeds, K values and sample sizes — not
    just on the one fixture sample. A single near-tie argmin flip
    between the two float orderings would change centroids."""
    import numpy as np

    from mqtt_influx_storage_service_spark.operators import mlops as M
    from mqtt_influx_storage_service_spark.operators import similarity as S

    rng = np.random.RandomState(seed % (2**31))
    sample = rng.normal(size=(max(m, k), 16))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    assert np.array_equal(S._lloyd_pairs(sample, k=k), M._lloyd(sample, k=k))
