"""Property tests for the hybrid-retrieval tier: text_bm25 (Okapi BM25)
and sim_hybrid_rrf (reciprocal-rank fusion). Oracle hash-equivalence is
covered by tools/check_oracles.py; these pin the retrieval semantics a
hash can't explain by itself."""

from __future__ import annotations

import math

from mqtt_influx_storage_service_spark.operators.similarity import (
    RRF_K,
    RRF_POOL,
    RRF_TOPK,
    sim_hybrid_rrf,
)
from mqtt_influx_storage_service_spark.operators.textops import (
    BM25_QUERY_STRIDE,
    BM25_QUERY_TERMS,
    BM25_TOPK,
    _bm25_query_filter,
    bm25_ranked,
    text_bm25,
)
from mqtt_influx_storage_service_spark.sources import load_table


def test_bm25_rank_structure(spark, sf_dir):
    out = text_bm25(spark, sf_dir).toPandas()
    n_queries = (
        load_table(spark, sf_dir, "documents")
        .filter(_bm25_query_filter())
        .count()
    )
    assert set(out["query_id"].unique()) == set(
        range(0, n_queries * BM25_QUERY_STRIDE, BM25_QUERY_STRIDE)
    )
    for qid, grp in out.groupby("query_id"):
        grp = grp.sort_values("rank")
        # contiguous ranks from 1, scores non-increasing, doc_id tiebreak
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= BM25_TOPK
        scores = list(grp["bm25"])
        docs = list(grp["doc_id"])
        for i in range(1, len(grp)):
            assert scores[i - 1] > scores[i] or (
                scores[i - 1] == scores[i] and docs[i - 1] < docs[i]
            )
    # every hit matched at least one and at most all query terms
    assert (out["n_terms"] >= 1).all()
    assert (out["n_terms"] <= BM25_QUERY_TERMS).all()
    assert (out["bm25"] > 0).all()


def test_bm25_hits_contain_query_terms(spark, sf_dir):
    """Retrieval ground truth: every returned doc really contains every
    term BM25 credited it for (n_terms == |query terms ∩ doc words|)."""
    out = text_bm25(spark, sf_dir).toPandas()
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    qterms = {
        r["doc_id"]: list(
            dict.fromkeys(r["text"].split(" ")[:BM25_QUERY_TERMS])
        )
        for r in load_table(spark, sf_dir, "documents")
        .filter(_bm25_query_filter())
        .collect()
    }
    for _, row in out.iterrows():
        terms = set(qterms[row["query_id"]])
        assert row["n_terms"] == len(terms & docs[row["doc_id"]])


def test_rrf_fusion_arithmetic(spark, sf_dir):
    """rrf_micro must equal the recomputed fusion of the two rank
    columns, and every fused row must come from at least one list."""
    out = sim_hybrid_rrf(spark, sf_dir).toPandas()
    assert len(out) > 0
    for _, row in out.iterrows():
        expected = 0
        for r in (row["rank_text"], row["rank_vec"]):
            if not (r is None or (isinstance(r, float) and math.isnan(r))):
                expected += int(round(1_000_000.0 / (RRF_K + int(r))))
        assert int(row["rrf_micro"]) == expected
        assert expected > 0
    for _, grp in out.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= RRF_TOPK
        micros = list(grp["rrf_micro"])
        docs = list(grp["doc_id"])
        for i in range(1, len(grp)):
            assert micros[i - 1] > micros[i] or (
                micros[i - 1] == micros[i] and docs[i - 1] < docs[i]
            )


def test_rrf_both_lists_beat_single_list_at_same_depth(spark, sf_dir):
    """A doc present in BOTH retriever pools at rank r outscores a doc
    present in only one pool at the same rank r (the defining RRF
    property)."""
    text = bm25_ranked(spark, sf_dir, RRF_POOL).toPandas()
    fused = sim_hybrid_rrf(spark, sf_dir).toPandas()
    both = fused.dropna(subset=["rank_text", "rank_vec"])
    only = fused[fused["rank_text"].isna() | fused["rank_vec"].isna()]
    # The fixture must actually produce both populations — without these
    # the property below would pass vacuously with no signal (ADVICE r4).
    assert len(both) > 0
    assert len(only) > 0
    # Defining RRF property, in its always-comparable form: a doc in
    # BOTH pools at ranks (r1, r2) outscores any single-pool doc whose
    # rank is >= min(r1, r2), because the both-doc's better term alone
    # already dominates the single-doc's whole score.
    compared = 0
    for qid, q_only in only.groupby("query_id"):
        q_both = both[both["query_id"] == qid]
        single_rank = q_only["rank_text"].fillna(q_only["rank_vec"])
        for _, b in q_both.iterrows():
            b_best = int(min(b["rank_text"], b["rank_vec"]))
            for _, s in q_only[single_rank >= b_best].iterrows():
                assert int(b["rrf_micro"]) > int(s["rrf_micro"])
                compared += 1
    assert compared > 0, "no comparable (both, single) pair at this scale"
    assert len(text) > 0
