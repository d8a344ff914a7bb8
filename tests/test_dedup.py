"""Near-dup operator self-consistency (SURVEY.md §5 item 5): the
hash-based approximators are checked against the exact-Jaccard oracle
query at sf0.001."""

from __future__ import annotations

import pytest

from mqtt_influx_storage_service_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)


@pytest.fixture(scope="module")
def exact_pairs(spark, sf_dir):
    rows = dedup_ngram_jaccard(spark, sf_dir).collect()
    return {(r.doc_a, r.doc_b) for r in rows}


def test_exact_dedup_counts(spark, sf_dir):
    rows = dedup_exact(spark, sf_dir).collect()
    # fixture has no exact dups: every group is a singleton
    assert len(rows) == 500
    assert all(r.n_copies == 1 for r in rows)


def test_minhash_lsh_recall(spark, sf_dir, exact_pairs):
    """LSH candidates verified by exact Jaccard must recover (almost)
    all true pairs and no false positives (verification is exact)."""
    got = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert got <= exact_pairs, f"false positives: {got - exact_pairs}"
    recall = len(got & exact_pairs) / max(len(exact_pairs), 1)
    assert recall >= 0.8, f"recall {recall} over {len(exact_pairs)} true pairs"


def test_simhash_subset_of_near_dups(spark, sf_dir, exact_pairs):
    """Hamming<=3 simhash pairs should be high-similarity documents —
    every reported pair must also be an exact-Jaccard near-dup pair."""
    got = dedup_simhash(spark, sf_dir).collect()
    assert len(got) > 0, "fixture contains near-dups; simhash found none"
    for r in got:
        assert (r.doc_a, r.doc_b) in exact_pairs, (
            f"simhash pair ({r.doc_a},{r.doc_b}) hamming={r.hamming} "
            "is not a true near-dup"
        )


def test_simhash_deterministic(spark, sf_dir):
    a = dedup_simhash(spark, sf_dir).collect()
    b = dedup_simhash(spark, sf_dir).collect()
    assert a == b
