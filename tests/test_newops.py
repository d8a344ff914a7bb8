"""Property tests for the r3 operators (oracle hash-equivalence is
covered by tools/check_oracles.py; these pin the semantics that a
hash match alone wouldn't explain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.operators.pipeline import (
    pipeline_interleave,
)
from mqtt_influx_storage_service_spark.operators.textops import (
    REP_TOP_BIGRAM_MAX,
    REP_TOP_WORD_MAX,
    text_repetition,
)
from mqtt_influx_storage_service_spark.operators.timeseries import (
    HIST_NBINS,
    MAD_Z_THRESHOLD,
    ts_histogram,
    ts_mad_outliers,
)
from mqtt_influx_storage_service_spark.sources import load_table


def test_histogram_partitions_the_corpus(spark, sf_dir):
    hist = ts_histogram(spark, sf_dir)
    rows = hist.collect()
    assert all(0 <= r.bucket < HIST_NBINS for r in rows)
    assert all(r.bucket_hi - r.bucket_lo == 25.0 for r in rows)
    total = sum(r.n for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()


def test_mad_outliers_all_exceed_threshold(spark, sf_dir):
    out = ts_mad_outliers(spark, sf_dir).collect()
    assert out, "sf0.001 fixture should contain MAD outliers"
    assert all(abs(r.robust_z) > MAD_Z_THRESHOLD for r in out)
    # robust stats: the flagged values sit far from the per-type median
    assert all(abs(r.value - r.med) > 3 * r.mad for r in out)


def test_repetition_flags_are_consistent(spark, sf_dir):
    rep = text_repetition(spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert len(rep) == docs_n  # one row per document, none dropped
    for r in rep:
        expect = (
            r.top_word_frac <= REP_TOP_WORD_MAX
            and r.top_bigram_frac <= REP_TOP_BIGRAM_MAX
        )
        assert r.keep == expect
        assert 0 < r.unique_word_ratio <= 1.0
        assert r.top_word_frac >= 1.0 / r.n_words - 1e-6  # round(.,6) slack


def test_interleave_is_a_round_robin_total_order(spark, sf_dir):
    rows = pipeline_interleave(spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs_n
    pos = [r.interleave_pos for r in rows]
    assert len(set(pos)) == len(pos)  # total order, no collisions
    # within any round, every source appears at most once
    seen = set()
    for r in rows:
        assert (r.round, r.source) not in seen
        seen.add((r.round, r.source))
    # round-robin: round 1 positions all precede round 2's for the
    # same source
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.round, r.interleave_pos))
    for pairs in by_src.values():
        pairs.sort()
        assert all(a[1] < b[1] for a, b in zip(pairs, pairs[1:]))


def test_interleave_scale_shape(spark, sf_dir):
    """The total order must come from the per-source window + broadcast
    dims — a global window over the corpus would serialize at 100 TB.
    Pin: corpus window partitions by source (hashpartitioning), the
    source dim + count arrive by broadcast, no cartesian explosion."""
    from mqtt_influx_storage_service_spark import plans

    df = pipeline_interleave(spark, sf_dir)
    plan = plans.plan_str(df)
    assert "hashpartitioning(source" in plan  # corpus window is partitioned
    assert plans.has_broadcast_join(df)
    assert not plans.has_cartesian(df) or "BroadcastNestedLoopJoin" in plan
    # the single-partition windows (SinglePartition) may only feed the
    # vocabulary-sized source dimension, whose input is a distinct agg
    # over one column — never a corpus-wide relation with doc_id
    import re

    for m in re.finditer(
        r"Exchange SinglePartition[^\n]*\n((?:.+\n){0,6})", plan
    ):
        assert "doc_id" not in m.group(1)


def test_ewma_semantics(spark, sf_dir):
    """EWMA invariants: first point of a series equals its value;
    every EWMA lies within the min/max of its lookback frame; weights
    emphasize the newest point (EWMA closer to current value than the
    plain frame mean for a monotone frame)."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        EWMA_K,
        ts_ewma,
    )
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_K - 1), 0)
    )
    frames = ev.select(
        "event_id",
        F.min("value").over(w).alias("fmin"),
        F.max("value").over(w).alias("fmax"),
        F.row_number()
        .over(
            Window.partitionBy("user_id", "event_type").orderBy(
                "ts", "event_id"
            )
        )
        .alias("rn"),
    )
    joined = ts_ewma(spark, sf_dir).join(frames, "event_id").collect()
    assert joined
    for r in joined:
        assert r.fmin - 1e-6 <= r.ewma <= r.fmax + 1e-6
        if r.rn == 1:
            assert abs(r.ewma - r.value) < 1e-6


def test_langid_ngram_separates_distinct_char_distributions(spark, tmp_path):
    """The hashed-trigram NB classifier must be PERFECT on a corpus
    whose languages genuinely differ in character distribution (the
    shipped fixtures label random shared-vocabulary text, so accuracy
    there only reflects label noise — this synthesizes real signal:
    disjoint alphabets per 'language'). Also pins determinism and the
    one-row-per-doc shape."""
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.textops import (
        text_langid_ngram,
    )

    alphabets = {"aa": "abcdefg", "bb": "hijklmn", "cc": "opqrstu"}
    rows = []
    doc_id = 0
    for lang, chars in alphabets.items():
        for i in range(20):
            # deterministic pseudo-text over the language's alphabet
            text = " ".join(
                "".join(chars[(i * 7 + j * 3 + k) % len(chars)]
                        for k in range(5))
                for j in range(30)
            )
            rows.append((doc_id, text, lang, "synth", len(text)))
            doc_id += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    out = text_langid_ngram(spark, str(tmp_path)).collect()
    assert len(out) == doc_id  # one row per doc
    assert all(r.predicted_lang == r.lang for r in out)
    again = text_langid_ngram(spark, str(tmp_path)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# r4 batch 2: pattern match, M4 downsample, range search, bigram LM,
# cross-correlation (oracle hash-equivalence via tools/check_oracles.py;
# these pin the semantics a hash match alone wouldn't explain)
# ---------------------------------------------------------------------------


def test_pattern_match_flags_true_spikes(spark, sf_dir):
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        SPIKE_FACTOR,
        ts_pattern_match,
    )

    out = ts_pattern_match(spark, sf_dir).collect()
    assert out, "sf0.001 fixture should contain isolated spikes"
    for r in out:
        assert r.value > SPIKE_FACTOR * r.prev_value
        assert r.value > SPIKE_FACTOR * r.next_value


def test_downsample_m4_invariants(spark, sf_dir):
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_downsample,
    )

    rows = ts_downsample(spark, sf_dir).collect()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == ev_n  # partition of the corpus
    for r in rows:
        # first/last live inside the [min, max] envelope
        assert r.min_value <= r.first_value <= r.max_value
        assert r.min_value <= r.last_value <= r.max_value


def test_range_search_is_threshold_complete(spark, sf_dir):
    """Range search ≡ the brute-force scored join filtered at the
    radius: every returned pair qualifies, and per query the result
    contains every top-k neighbor whose cosine clears the radius."""
    from mqtt_influx_storage_service_spark.operators.similarity import (
        RANGE_THRESHOLD,
        sim_cosine_topk,
        sim_range_search,
    )

    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim_range_search(spark, sf_dir).collect()
    }
    assert got and all(c >= RANGE_THRESHOLD for c in got.values())
    for r in sim_cosine_topk(spark, sf_dir).collect():
        if r.cosine >= RANGE_THRESHOLD:
            assert got[(r.query_id, r.neighbor_id)] == r.cosine


def test_bigram_lm_scores_common_text_higher(spark, tmp_path):
    """A doc made of the corpus's dominant bigram scores above a doc of
    bigrams that occur nowhere else (the fluency-gate property)."""
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.textops import (
        text_bigram_lm,
    )

    common = " ".join(["the fast"] * 20)      # "the fast"/"fast the" everywhere
    rare = "zq wx vk jm qq zz pp ll"          # bigrams unique to this doc
    rows = [(i, common, "en", "s", len(common)) for i in range(10)]
    rows.append((99, rare, "en", "s", len(rare)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    out = {r.doc_id: r.typicality for r in text_bigram_lm(spark, str(tmp_path)).collect()}
    assert out[99] == 1.0                    # every rare bigram seen once
    assert out[0] > 100 * out[99]


def test_cross_correlation_detects_perfect_correlation(spark, tmp_path):
    """Synthetic device where purchase = 2 x click daily revenue gives
    r = 1; an anti-tracking device gives r = -1."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_cross_correlation,
    )

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for d in range(6):
        day = base + dt.timedelta(days=d)
        for etype, val, uid in [
            ("click", 10.0 + d, 1), ("purchase", 20.0 + 2 * d, 1),
            ("click", 10.0 + d, 2), ("purchase", 50.0 - 3 * d, 2),
        ]:
            rows.append((eid, day, uid, etype, val, "{}"))
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    out = {r.user_id: r.corr for r in ts_cross_correlation(spark, str(tmp_path)).collect()}
    assert out[1] == 1.0
    assert out[2] == -1.0


# ---------------------------------------------------------------------------
# r4 batch 3: InfluxQL parity family + curation gates
# ---------------------------------------------------------------------------

def test_cumulative_sum_reaches_series_total(spark, sf_dir):
    """The last cumulative value of each series equals the cents-exact
    series total, and row-to-row increments equal the row's value."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_cumulative_sum,
    )

    out = ts_cumulative_sum(spark, sf_dir)
    finals = (
        out.groupBy("user_id", "event_type")
        .agg(
            F.max("cumulative").alias("max_cum"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total"
            ),
        )
        .collect()
    )
    assert finals and all(abs(r.max_cum - r.total) < 1e-9 for r in finals)


def test_counter_rate_reset_semantics(spark, tmp_path):
    """A counter drop counts the post-reset sample fully (PromQL
    increase): 10 -> 30 -> 5 -> 25 gives deltas 20, 5, 20 => 45."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_counter_rate,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=5 * i), 1, "click", v, "{}")
        for i, v in enumerate([10.0, 30.0, 5.0, 25.0])
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    r = ts_counter_rate(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0].increase == 45.0
    assert r[0].n_resets == 1
    assert r[0].n_samples == 3


def test_percentile_values_are_series_elements(spark, sf_dir):
    """Nearest-rank percentiles are actual samples of the series, and
    p95 >= p50."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_percentile,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    p = ts_percentile(spark, sf_dir)
    rows = p.collect()
    assert rows and all(r.p95_value >= r.p50_value for r in rows)
    # membership: joining each percentile value back to the series finds it
    missing = (
        p.select("user_id", "event_type", F.col("p95_value").alias("value"))
        .union(p.select("user_id", "event_type", F.col("p50_value").alias("value")))
        .join(ev, ["user_id", "event_type", "value"], "left_anti")
        .count()
    )
    assert missing == 0


def test_skew_safe_twins_equal_exact_forms(spark, sf_dir):
    """VERDICT r7 #5: the chunked cumulative sum and two-phase
    percentile are EXACT twins — bit-identical rows to the plain
    forms on the fixtures (they share the oracle SQL, so this is the
    local pin of what the driver hash certifies). Plan shape: the
    chunked form's windows are keyed by (series, day) / day-totals,
    never one running frame over a whole series; the two-phase form
    windows over (series, value) counts, a relation collapsed by a
    partial-aggregable hash agg before any sort."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_cumulative_sum,
        ts_cumulative_sum_chunked,
        ts_percentile,
        ts_percentile_twophase,
    )

    plain = ts_cumulative_sum(spark, sf_dir)
    chunked = ts_cumulative_sum_chunked(spark, sf_dir)
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(plain).count() == 0
    # the chunked plan aggregates day totals before its offset window
    assert "HashAggregate" in (
        chunked._jdf.queryExecution().executedPlan().toString()
    )

    pe = {
        (r.user_id, r.event_type): (r.n_points, r.p50_value, r.p95_value)
        for r in ts_percentile(spark, sf_dir).collect()
    }
    pt = {
        (r.user_id, r.event_type): (r.n_points, r.p50_value, r.p95_value)
        for r in ts_percentile_twophase(spark, sf_dir).collect()
    }
    assert pe == pt


def test_skew_safe_twins_share_their_oracles_verbatim():
    """The twins' exactness claim is certified by registering the SAME
    oracle SQL object as their plain forms — pin the identity so a
    future edit to one form's oracle can't silently diverge the other
    (they would then hash against different truths)."""
    from mqtt_influx_storage_service_spark.operators.timeseries import ORACLES

    assert ORACLES["ts_cumulative_sum_chunked"] is ORACLES["ts_cumulative_sum"]
    assert ORACLES["ts_percentile_twophase"] is ORACLES["ts_percentile"]


def test_holt_winters_salted_tail_is_exact(spark, sf_dir):
    """The r8 salted two-phase tail selection in ts_holt_winters picks
    the same last-K samples as a direct single-window ranking — fits
    and forecasts are bit-identical (the oracle hash must not move)."""
    from pyspark.sql import Window

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        HW_LOOKBACK,
        ts_holt_winters,
    )

    wdesc = (
        Window.partitionBy("user_id", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    direct_tail = (
        ev.select(
            "user_id", "event_type", "event_id",
            F.row_number().over(wdesc).alias("rn"),
        )
        .filter(F.col("rn") <= HW_LOOKBACK)
        .select("user_id", "event_type", "event_id")
    )
    got = ts_holt_winters(spark, sf_dir)
    # the salted plan ranks within (series, salt) first
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan
    # every series fits on >= 2 points and the fit count equals the
    # bounded tail size the direct window selects
    sizes = {
        (r.user_id, r.event_type): r.cnt
        for r in direct_tail.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .collect()
    }
    fit = {(r.user_id, r.event_type): r.n_fit for r in got.collect()}
    assert fit == sizes


def test_spread_envelope(spark, tmp_path):
    """first/last select by time (not by value), spread = max - min."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import ts_spread

    base = dt.datetime(2024, 3, 1)
    vals = [5.0, 9.0, 2.0, 7.0]
    rows = [
        (i, base + dt.timedelta(hours=i), 3, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    r = ts_spread(spark, str(tmp_path)).collect()[0]
    assert (r.first_value, r.last_value) == (5.0, 7.0)
    assert (r.min_value, r.max_value, r.spread) == (2.0, 9.0, 7.0)
    assert r.elapsed_total_s == 3 * 3600.0


def _write_docs(tmp_path, docs):
    import pandas as pd

    pd.DataFrame(
        [(i, t, lang, "unit", len(t)) for i, (t, lang) in enumerate(docs)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")


def test_gopher_rules_fire_individually(spark, tmp_path):
    """Each rule can fail independently and keep is their conjunction."""
    from mqtt_influx_storage_service_spark.operators.textops import (
        text_gopher_rules,
    )

    good = "the a " + " ".join(["value"] * 40)          # passes everything
    short = "the a value"                                # word count
    no_stop = " ".join(["value"] * 40)                   # stopwords
    symbols = "the a " + " ".join(["###"] * 40)          # symbol ratio (and alpha)
    _write_docs(tmp_path, [(good, "en"), (short, "en"),
                           (no_stop, "en"), (symbols, "en")])

    out = {r.doc_id: r for r in text_gopher_rules(spark, str(tmp_path)).collect()}
    assert out[0].keep
    assert not out[1].keep and not out[1].rule_word_count
    assert not out[2].keep and not out[2].rule_stopwords
    assert not out[3].keep and not out[3].rule_symbol_ratio
    for r in out.values():
        conj = (
            r.rule_word_count and r.rule_word_len and r.rule_symbol_ratio
            and r.rule_alpha_ratio and r.rule_stopwords
        )
        assert r.keep == conj


def test_quality_gate_reason_precedence(spark, tmp_path):
    """An exact duplicate is reported as such even when later gates also
    fail; every kept row has all flags true."""
    from mqtt_influx_storage_service_spark.operators.pipeline import (
        pipeline_quality_gate,
    )

    dup = "x"  # fails gopher too — duplicate verdict must win for doc 2
    _write_docs(tmp_path, [(dup, "en"), ("the a value", "en"), (dup, "en")])

    out = {r.doc_id: r for r in pipeline_quality_gate(spark, str(tmp_path)).collect()}
    assert len(out) == 3  # audit view: every doc appears
    assert out[2].drop_reason == "exact_duplicate"
    assert out[0].drop_reason != "exact_duplicate"  # min doc_id represents
    for r in out.values():
        assert r.keep == (r.drop_reason == "kept")
        if r.keep:
            assert (
                r.is_representative and r.gopher_keep
                and r.quality_keep and r.lang_match
            )


def test_holt_winters_linear_series_forecasts_exactly(spark, tmp_path):
    """On an exactly-linear series Holt's method locks to the line:
    level = last sample, trend = slope, forecasts continue the line."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_holt_winters,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "click", 10.0 + 3.0 * i, "{}")
        for i in range(12)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    r = ts_holt_winters(spark, str(tmp_path)).collect()[0]
    assert r.n_fit == 12
    assert r.level == 10.0 + 3.0 * 11
    assert r.trend == 3.0
    assert (r.fc_1, r.fc_2, r.fc_3) == (46.0, 49.0, 52.0)


def test_seasonal_profile_residuals_center_on_zero(spark, sf_dir):
    """Cents-summed residuals within one (type, hour) slot cancel to ~0
    (the profile IS the slot mean), and every event row survives the
    profile join."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_seasonal_profile,
    )

    out = ts_seasonal_profile(spark, sf_dir)
    n_events = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_events
    slots = (
        out.groupBy("event_type", "hour_of_day")
        .agg(
            F.sum("residual").alias("sum_resid"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    # mean residual per slot bounded by the 1e-6 rounding of the profile
    assert all(abs(r.sum_resid) / r.n < 1e-5 for r in slots)


# ----- r4 batch 2: InfluxQL completions + LLM-pipeline ops -----------------


def test_chunking_covers_and_overlaps(spark, sf_dir):
    """Every token lands in >= 1 chunk, full windows carry exactly
    CHUNK_TOKENS tokens, and consecutive chunks share the stride
    overlap (reassembling chunk tails reproduces the document)."""
    from mqtt_influx_storage_service_spark.operators.textops import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunking,
    )

    rows = text_chunking(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id].split(" ")
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert len(chunks) == (len(toks) - 1) // CHUNK_STRIDE + 1
        for c in chunks:
            start = c.chunk_idx * CHUNK_STRIDE  # 0-based
            expect = toks[start:start + CHUNK_TOKENS]
            assert c.chunk_text.split(" ") == expect
            assert c.chunk_tokens == len(expect)
        # stitching strides back together reproduces the document
        stitched = []
        for c in chunks:
            stitched.extend(c.chunk_text.split(" ")[:CHUNK_STRIDE])
        stitched.extend(chunks[-1].chunk_text.split(" ")[CHUNK_STRIDE:])
        assert stitched == toks


def test_quantize_int8_matches_numpy(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.similarity import (
        emb_quantize_int8,
    )

    rows = {r.vec_id: r for r in emb_quantize_int8(spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    assert set(rows) == set(emb["vec_id"])
    for _, er in emb.iterrows():
        x = np.asarray(er.embedding, dtype=np.float64)
        r = rows[er.vec_id]
        amax = np.abs(x).max()
        codes = np.array([int(c) for c in r.codes_str.split(",")])
        assert np.abs(codes).max() <= 127
        expect = np.round(x * 127.0 / amax).astype(int) if amax else 0 * codes
        assert (codes == expect).all()
        mse = ((x - codes * amax / 127.0) ** 2).sum() * 1e6 / 64
        assert abs(r.mse_e6 - mse) < 1e-4
        assert abs(r.amax6 - round(amax, 6)) < 1e-9


def test_centroid_assign_is_argmax_of_label_means(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.similarity import (
        sim_centroid_assign,
    )

    rows = sim_centroid_assign(spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    micro = np.round(M * 1e6)
    labels = emb["label"].to_numpy()
    cents = {
        lb: micro[labels == lb].sum(axis=0) / ((labels == lb).sum() * 1e6)
        for lb in np.unique(labels)
    }
    assert len(rows) == len(emb)
    ids = {int(v): i for i, v in enumerate(emb["vec_id"])}
    for r in rows:
        x = M[ids[r.vec_id]]
        scored = sorted(
            (
                (-round(
                    float(x @ c) / (np.linalg.norm(x) * np.linalg.norm(c)), 6
                ), lb)
                for lb, c in cents.items()
            ),
        )
        assert r.assigned_label == scored[0][1]
        assert r.correct == (r.assigned_label == r.true_label)


def test_elapsed_matches_pandas_diff(spark, sf_dir):
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_elapsed,
    )

    rows = ts_elapsed(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_type", "ts", "event_id"]
    )
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["expect"] = ev.groupby(["user_id", "event_type"])["ts_us"].diff()
    expect = {
        int(r.event_id): None if pd.isna(r.expect) else int(r.expect)
        for r in ev.itertuples()
    }
    assert len(rows) == len(ev)
    for r in rows:
        assert r.elapsed_us == expect[r.event_id]
        if r.elapsed_us is not None:
            assert r.elapsed_us >= 0


def test_top_per_bucket_is_true_topn(spark, sf_dir):
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        TOP_PER_BUCKET_N,
        ts_top_per_bucket,
    )

    rows = ts_top_per_bucket(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["bucket"] = ev["ts"].dt.floor("D")
    got = {}
    for r in rows:
        got.setdefault((r.event_type, r.bucket), []).append(r)
    for (et, bucket), grp in ev.groupby(["event_type", "bucket"]):
        want = grp.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(TOP_PER_BUCKET_N)
        g = sorted(got[(et, bucket.to_pydatetime())], key=lambda r: r.rank_in_bucket)
        assert [r.event_id for r in g] == list(want["event_id"])


def test_sample_is_deterministic_subset(spark, sf_dir):
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        SAMPLE_N,
        ts_sample,
    )

    a = sorted((r.user_id, r.event_type, r.event_id)
               for r in ts_sample(spark, sf_dir).collect())
    b = sorted((r.user_id, r.event_type, r.event_id)
               for r in ts_sample(spark, sf_dir).collect())
    assert a == b  # reproducible sample
    ev = load_table(spark, sf_dir, "events")
    sizes = {
        (r.user_id, r.event_type): r.n
        for r in ev.groupBy("user_id", "event_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    per_series = {}
    for u, t, _ in a:
        per_series[(u, t)] = per_series.get((u, t), 0) + 1
    for key, n in sizes.items():
        assert per_series.get(key, 0) == min(SAMPLE_N, n)


def test_changepoint_matches_numpy_cusum(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_changepoint,
    )

    rows = {
        (r.user_id, r.event_type): r
        for r in ts_changepoint(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_type", "ts", "event_id"]
    )
    for (u, t), grp in ev.groupby(["user_id", "event_type"]):
        cents = np.round(grp["value"].to_numpy() * 100).astype(np.int64)
        n = len(cents)
        ns = n * np.cumsum(cents) - np.arange(1, n + 1) * cents.sum()
        best = int(np.abs(ns).argmax())  # ties -> earliest, same as query
        r = rows[(u, t)]
        assert r.cp_event_id == grp["event_id"].iloc[best]
        assert abs(r.cusum_peak - abs(ns[best]) / (n * 100.0)) < 1e-9


def test_holt_winters_seasonal_locks_to_pure_seasonal_line(spark, tmp_path):
    """On value = trend·i + weekly_pattern (an exactly additive
    seasonal-linear series), the seasonal fold's forecasts must
    continue the pattern: with the engine's init (l0 = x_S,
    b0 = (x_S − x1)/S, seas_i = x_i − l0) every smoothing update is a
    Python-reproducible IEEE sequence — compare against a reference
    fold, bit-exact, same discipline as the non-seasonal property
    test."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        HWS_SEASON,
        ts_holt_winters_seasonal,
    )

    base = dt.datetime(2024, 1, 1)
    pattern = [5.0, -3.0, 2.0, 0.0, -4.0, 1.0, -1.0]
    n_days = 28
    rows = [
        (
            i,
            base + dt.timedelta(days=i, hours=3),
            1,
            "click",
            round(100.0 + 2.0 * i + pattern[i % 7], 2),
            "{}",
        )
        for i in range(n_days)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    got = {
        r.horizon: r.forecast
        for r in ts_holt_winters_seasonal(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 3}

    # reference fold (pure python, same association)
    xs = [round(100.0 + 2.0 * i + pattern[i % 7], 2) for i in range(n_days)]
    S = HWS_SEASON
    l = xs[S - 1]
    b = (xs[S - 1] - xs[0]) / float(S)
    seas = [x - l for x in xs[:S]]
    for x in xs[S:]:
        s1 = seas[0]
        lp = 0.5 * (x - s1) + 0.5 * (l + b)
        nb = 0.5 * (0.5 * (x - s1) + 0.5 * (l + b) - l) + 0.5 * b
        ns = 0.5 * (x - (0.5 * (x - s1) + 0.5 * (l + b))) + 0.5 * s1
        l, b = lp, nb
        seas = seas[1:] + [ns]
    for h in (1, 2, 3):
        want = l + float(h) * b + seas[(h - 1) % S]
        assert got[h] == want  # bit-exact raw doubles
    # and the forecasts land in the series' continuation region (the
    # fixed α=β=γ=0.5 smoothing still carries an init transient after
    # 21 steps, so exact truth-tracking is NOT a property to pin —
    # bit-exactness of the fold above is; this is a garbage detector)
    last = 100.0 + 2.0 * (n_days - 1) + pattern[(n_days - 1) % 7]
    for h in (1, 2, 3):
        assert last - 10.0 < got[h] < last + 2.0 * 3 + 12.0


def test_influxql_seasonal_holt_winters_parses_and_matches_operator_shape(spark):
    """HOLT_WINTERS(MEAN(value), 3, 7) through the PARSER produces 3
    future daily buckets whose times continue the bucket grid."""
    from mqtt_influx_storage_service_spark.functions.influxql import influxql

    q = (
        "SELECT HOLT_WINTERS(MEAN(value), 3, 7) AS fc FROM click "
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-29 00:00:00' "
        "GROUP BY time(1d)"
    )
    rows = influxql(spark, "/root/testdata/sf0.001", q).collect()
    assert len(rows) == 3
    times = [r.time for r in rows]
    assert times == sorted(times)
    import datetime as dt

    assert times[0] == dt.datetime(2024, 1, 29)
    assert all(isinstance(r.fc, float) for r in rows)


def test_histogram_quantile_brackets_exact_percentile(spark, sf_dir):
    """The bucketed estimator must land inside the bucket that holds
    the exact nearest-rank percentile, and be monotone in phi."""
    from mqtt_influx_storage_service_spark.operators.timeseries import (
        HIST_WIDTH,
        ts_histogram_quantile,
    )
    from mqtt_influx_storage_service_spark.sources import load_table
    from pyspark.sql import functions as F

    got = {
        (r.event_type, r.phi): r.quantile_value
        for r in ts_histogram_quantile(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    for etype in {k[0] for k in got}:
        vals = sorted(
            r.value for r in ev.filter(F.col("event_type") == etype).collect()
        )
        for phi in (0.5, 0.9, 0.99):
            exact = vals[min(len(vals) - 1, int(phi * len(vals)))]
            est = got[(etype, phi)]
            # estimator error is bounded by one bucket width (clamped
            # top bucket can exceed that only past the clamp bound)
            assert abs(est - exact) <= HIST_WIDTH or exact > est
        assert got[(etype, 0.5)] <= got[(etype, 0.9)] <= got[(etype, 0.99)]


def test_burn_rate_alert_needs_both_windows(spark, tmp_path):
    """Synthetic incident: a one-hour error spike inside an otherwise
    healthy day only fires the alert when the LONG window has also
    burned — the multi-window AND that suppresses flapping pages."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_burn_rate,
    )

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(24):
        # hour 6: total outage (100% errors); hour 18: brief 50% blip
        err_frac = 1.0 if h == 6 else (0.5 if h == 18 else 0.0)
        for i in range(20):
            etype = "error" if i < 20 * err_frac else "click"
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=i), 1, etype,
                 1.0, "{}")
            )
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    out = {r.hour.hour: r for r in ts_burn_rate(spark, str(tmp_path)).collect()}
    assert len(out) == 24
    # the outage hour fires: short burn 20x budget, long window (6h
    # trailing, 1/6 of it at 100%) burns ~3.3x
    assert out[6].alert
    assert out[6].burn_1h > 10
    # the isolated blip does NOT page: short window burns but the
    # trailing long window stays under the threshold
    assert out[18].burn_1h > 2.0
    assert not out[18].alert
    # healthy hours are quiet
    assert not out[3].alert and out[3].n_err == 0


def test_availability_counts_gaps_exactly(spark, tmp_path):
    """Synthetic device with a known hole: events in hours 0,1,2 and
    5,6 → span 7, observed 5, availability 5/7, gap 2. A never-gapping
    device reports 1.0."""
    import datetime as dt

    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.timeseries import (
        ts_availability,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in (0, 1, 2, 5, 6):
        rows.append((eid, base + dt.timedelta(hours=h, minutes=7), 1,
                     "click", 1.0, "{}"))
        eid += 1
    for h in range(4):
        rows.append((eid, base + dt.timedelta(hours=h), 2,
                     "click", 1.0, "{}"))
        eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")

    out = {r.user_id: r for r in ts_availability(spark, str(tmp_path)).collect()}
    assert out[1].span_hours == 7 and out[1].hours_with_data == 5
    assert out[1].gap_hours == 2
    assert out[1].availability == round(5 / 7, 6)
    assert out[2].availability == 1.0 and out[2].gap_hours == 0
