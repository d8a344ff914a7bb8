"""ANN vs brute-force recall (SURVEY.md §5 item 5)."""

from __future__ import annotations

import pytest

from mqtt_influx_storage_service_spark.operators.similarity import (
    TOPK,
    sim_ann_lsh,
    sim_cosine_topk,
)


@pytest.fixture(scope="module")
def brute(spark, sf_dir):
    rows = sim_cosine_topk(spark, sf_dir).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_brute_force_shape(brute):
    assert len(brute) == 100
    assert all(len(v) == TOPK for v in brute.values())


def test_ann_recall(spark, sf_dir, brute):
    """Multi-probe hyperplane LSH recall@5 vs exact top-5. Random
    near-orthogonal fixture vectors are the hard case for LSH, so the
    bar is modest — the assertion pins 'plumbing works and is far from
    random' (random recall ~ 5/500 = 1%)."""
    rows = sim_ann_lsh(spark, sf_dir).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for q, truth in brute.items():
        hits += len(got.get(q, set()) & truth)
        total += len(truth)
    recall = hits / total
    assert recall >= 0.3, f"ANN recall@{TOPK} = {recall:.3f}"


def test_ann_is_deterministic(spark, sf_dir):
    a = sim_ann_lsh(spark, sf_dir).collect()
    b = sim_ann_lsh(spark, sf_dir).collect()
    assert a == b


def test_threshold_pairs_gemm_equals_bruteforce(spark, sf_dir):
    """The tiled-GEMM candidate generation must recover EVERY pair the
    exact all-pairs baseline finds (verification is exact, so set
    equality == recall 1.0 AND precision 1.0). This is the assertion
    backing the oracle gate: the declared query is tiled, the oracle
    is brute force."""
    from mqtt_influx_storage_service_spark.operators.similarity import (
        sim_threshold_pairs,
        sim_threshold_pairs_bruteforce,
    )

    tiled = {
        (r.id_a, r.id_b, r.cosine)
        for r in sim_threshold_pairs(spark, sf_dir).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.cosine)
        for r in sim_threshold_pairs_bruteforce(spark, sf_dir).collect()
    }
    assert len(brute) > 0
    assert tiled == brute


def test_threshold_pairs_gemm_multi_tile_equals_single(spark, sf_dir):
    """Tiny tile size forces the cross-tile replication path (dozens
    of tile pairs); the result must be identical to the default
    one-tile run — proves the tile decomposition loses no pair at
    tile boundaries and the id_a < id_b dedupe is exact."""
    from mqtt_influx_storage_service_spark.operators.similarity import (
        SIM_THRESHOLD,
        _gemm_threshold_pairs,
    )

    small = {
        (r.id_a, r.id_b, r.cosine)
        for r in _gemm_threshold_pairs(spark, sf_dir, SIM_THRESHOLD, chunk=16).collect()
    }
    default = {
        (r.id_a, r.id_b, r.cosine)
        for r in _gemm_threshold_pairs(spark, sf_dir, SIM_THRESHOLD).collect()
    }
    assert len(default) > 0
    assert small == default


def test_threshold_and_embedding_dedup_plans_have_no_cross_product(spark, sf_dir):
    """The declared threshold/embedding-dedup queries must plan pure
    equi-joins: no CartesianProduct AND no BroadcastNestedLoopJoin."""
    from mqtt_influx_storage_service_spark import plans
    from mqtt_influx_storage_service_spark.operators.dedup import (
        dedup_embedding_cosine,
    )
    from mqtt_influx_storage_service_spark.operators.similarity import (
        sim_threshold_pairs,
    )

    for fn in (sim_threshold_pairs, dedup_embedding_cosine):
        text = plans.plan_str(fn(spark, sf_dir))
        assert "CartesianProduct" not in text, fn.__name__
        assert "BroadcastNestedLoopJoin" not in text, fn.__name__


def test_knn_exact_matches_numpy(spark, sf_dir):
    """sim_knn_exact — the oracle-anchored exact kNN graph — must agree
    with an independent numpy all-pairs kNN on neighbor SETS per vector
    (set, not sequence: cosine ties at 6 dp may order differently, but
    the windows tie-break identically by neighbor_id on equal rounded
    cosine, so compare the membership the rank cut implies)."""
    import numpy as np
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.similarity import (
        KNN_K,
        sim_knn_exact,
    )

    rows = sim_knn_exact(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r.vec_id, set()).add(r.neighbor_id)

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = np.round(Mn @ Mn.T, 6)  # same 6-dp rounding as the query
    np.fill_diagonal(C, -np.inf)
    assert set(got) == set(int(v) for v in ids)
    for i, vid in enumerate(ids):
        # numpy twin of the (cosine DESC, neighbor_id ASC) tie-break:
        # sort by (-cosine, vec_id) and cut at K
        order = sorted(range(len(ids)), key=lambda j: (-C[i, j], ids[j]))
        expect = {int(ids[j]) for j in order[:KNN_K]}
        assert got[int(vid)] == expect, int(vid)


def test_knn_graph_recall_and_shape(spark, sf_dir):
    """sim_knn_graph: every vector appears with <= K ranked neighbors,
    ranks are 1..k with cosine non-increasing, and recall vs the
    ORACLE-ANCHORED exact twin (sim_knn_exact, hash-checked against
    DuckDB by the driver) clears the pinned floor. The block-candidate
    generator can't see pairs sharing no block, so it is approximate by
    design; pairs at the dup threshold must ALWAYS be found."""
    from mqtt_influx_storage_service_spark.operators.similarity import (
        KNN_K,
        SIM_THRESHOLD,
        sim_knn_exact,
        sim_knn_graph,
    )

    rows = sim_knn_graph(spark, sf_dir).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, nbrs in by_vec.items():
        nbrs.sort(key=lambda r: r.rank)
        assert [r.rank for r in nbrs] == list(range(1, len(nbrs) + 1))
        assert len(nbrs) <= KNN_K
        cos = [r.cosine for r in nbrs]
        assert cos == sorted(cos, reverse=True)

    got = {(r.vec_id, r.neighbor_id) for r in rows}
    truth = sim_knn_exact(spark, sf_dir).collect()
    hits = total = 0
    for t in truth:
        total += 1
        hits += (t.vec_id, t.neighbor_id) in got
        # true near-dups always survive the block filter
        if t.cosine >= SIM_THRESHOLD:
            assert (t.vec_id, t.neighbor_id) in got
    recall = hits / total
    assert recall >= 0.5, recall


# ---------------------------------------------------------------------------
# IVF-list gating of the exact all-pairs family (VERDICT r4 #2): above
# GEMM_EXACT_MAX the tiled-GEMM kernels run within multi-probed coarse
# lists. These tests force the IVF path at fixture scale and pin (a) the
# no-false-positives property (verify is exact, so IVF output ⊆ exact
# output), (b) a recall floor on the adversarial near-orthogonal
# fixtures, and (c) that the size gate actually switches plans.
# ---------------------------------------------------------------------------

SF001 = "/root/testdata/sf0.01"


def test_ivf_pair_candidates_subset_with_recall_floor(spark):
    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import table_row_count

    emb = load_table(spark, SF001, "embeddings", rebalance=True)
    n = table_row_count(SF001, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in S._verify_cosine_pairs(
            emb, S._gemm_candidate_pairs(emb, n, S.SIM_THRESHOLD), S.SIM_THRESHOLD
        ).collect()
    }
    ivf = {
        (r.id_a, r.id_b)
        for r in S._verify_cosine_pairs(
            emb, S._ivf_gemm_candidate_pairs(emb, n, S.SIM_THRESHOLD), S.SIM_THRESHOLD
        ).collect()
    }
    assert len(exact) > 0
    assert ivf <= exact, "exact verify must forbid false positives"
    recall = len(ivf & exact) / len(exact)
    # noise-floor threshold on near-orthogonal fixtures is the WORST
    # case for coarse quantization (qualifying pairs are only weakly
    # pulled toward a shared centroid); clustered real corpora sit far
    # above this floor. Measured 0.88 at sf0.01 with 8 lists x 2 probes.
    assert recall >= 0.75, f"IVF pair recall {recall:.3f}"


def test_ivf_gate_switches_knn_plan(spark, monkeypatch):
    """Force the gate to 0 so sim_knn_graph takes the IVF-list path at
    fixture scale; the graph must keep its shape contract (k ranks per
    vector, cosine non-increasing) and recall a healthy share of the
    exact-path edges."""
    from mqtt_influx_storage_service_spark.operators import similarity as S

    exact_edges = {
        (r.vec_id, r.neighbor_id)
        for r in S.sim_knn_graph(spark, SF001).collect()
    }
    monkeypatch.setattr(S, "GEMM_EXACT_MAX", 0)
    rows = S.sim_knn_graph(spark, SF001).collect()
    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vec_rows in by_vec.values():
        vec_rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in vec_rows] == list(range(1, len(vec_rows) + 1))
        cosines = [r.cosine for r in vec_rows]
        assert cosines == sorted(cosines, reverse=True)
    ivf_edges = {(r.vec_id, r.neighbor_id) for r in rows}
    assert len(exact_edges) > 0
    recall = len(ivf_edges & exact_edges) / len(exact_edges)
    # top-3 graph edges at the noise floor: candidate-set overlap
    # measured 0.76 at sf0.01; the rescore+rank keeps the shared edges.
    assert recall >= 0.6, f"IVF kNN-graph edge recall {recall:.3f}"


def test_ivf_list_assignment_is_bounded_and_deterministic(spark):
    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import table_row_count

    emb = load_table(spark, SF001, "embeddings", rebalance=True)
    n = table_row_count(SF001, "embeddings")
    a1 = S._ivf_assigned(emb, n, S.IVF_PAIR_PROBES)
    sizes = {r.lst: r.cnt for r in a1.groupBy("lst").count().withColumnRenamed("count", "cnt").collect()}
    assert sum(sizes.values()) == n * S.IVF_PAIR_PROBES
    # every vector lands in exactly IVF_PAIR_PROBES distinct lists
    per_vec = a1.groupBy("vec_id").count().collect()
    assert all(r["count"] == S.IVF_PAIR_PROBES for r in per_vec)
    # deterministic: a second plan construction assigns identically
    a2 = {(r.vec_id, r.lst) for r in S._ivf_assigned(emb, n, S.IVF_PAIR_PROBES).collect()}
    assert {(r.vec_id, r.lst) for r in a1.collect()} == a2


# ---------------------------------------------------------------------------
# Hot-centroid split discipline in the CAPPED-K regime (r10 review
# finding): K is capped at IVF_SAMPLE//8, so above ~262k vectors the
# achievable mean list size exceeds the corpus-anchored target share.
# The split threshold must follow what K can deliver — a threshold
# below the mean flags EVERY centroid of a perfectly uniform corpus as
# hot and shatters the quantizer into sub-centroids trained on a
# couple of sample points each. Driver-side numpy only, no session.


def _capped_regime(n_rows: int, sample_n: int = 512, dim: int = 8, k: int = 64):
    import numpy as np

    from mqtt_influx_storage_service_spark.operators.mlops import _lloyd
    from mqtt_influx_storage_service_spark.operators.similarity import (
        IVF_PAIR_PROBES,
        IVF_TARGET_LIST,
    )

    rng = np.random.default_rng(7)
    sample = rng.normal(size=(sample_n, dim))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)
    C = _lloyd(sample, k=k)
    # the _pair_centroids threshold contract: corpus-anchored target,
    # floored at the achievable mean ownership under the chosen K
    target_share = max(
        1.0,
        IVF_TARGET_LIST * len(sample) / max(1, n_rows),
        IVF_PAIR_PROBES * len(sample) / max(1, len(C)),
    )
    return sample, C, target_share


def test_uniform_sample_does_not_shatter_under_capped_k():
    """n_rows far above the K cap's crossover: on uniform data the
    corpus-anchored share alone would sit BELOW the mean ownership and
    split everything; the achievable-mean floor must keep the
    quantizer intact (splits, if any, stay marginal)."""
    from mqtt_influx_storage_service_spark.operators.similarity import (
        IVF_PAIR_PROBES,
        _split_hot_centroids,
    )

    sample, C, target_share = _capped_regime(n_rows=4_000_000)
    out = _split_hot_centroids(sample, C, target_share, IVF_PAIR_PROBES)
    assert len(out) <= int(1.5 * len(C)), (
        f"uniform sample shattered {len(C)} -> {len(out)} centroids"
    )


def test_sq_dists_matches_naive_broadcast_form():
    """The matmul-form distances that make the adaptive pair-tier
    sample affordable (r11) must agree with the broadcast-difference
    form to float tolerance — an argmin flip here silently retrains
    every pair-tier quantizer."""
    import numpy as np

    from mqtt_influx_storage_service_spark.operators.similarity import (
        _sq_dists,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 16))
    C = rng.normal(size=(7, 16))
    naive = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assert np.allclose(_sq_dists(X, C), naive, atol=1e-9)
    assert (_sq_dists(X, C).argmin(axis=1) == naive.argmin(axis=1)).all()


def test_pair_sample_scales_with_wanted_k_up_to_ceiling():
    """r11 (VERDICT r10 #3): the pair-tier training sample grows
    8-points-per-wanted-list so K is NOT capped at IVF_SAMPLE//8 —
    the fixed-sample cap measured worse on BOTH axes at 800k (recall
    0.4668 vs 0.4882, Σ list²/n² 0.0174 vs 0.00556). Below the old
    crossover the sizing must reproduce the r10 regime exactly (the
    200k continuity audit is bit-identical); past PAIR_SAMPLE_MAX the
    cap returns (the ceiling is the documented knob)."""
    from mqtt_influx_storage_service_spark.operators.mlops import (
        IVF_SAMPLE,
    )
    from mqtt_influx_storage_service_spark.operators.similarity import (
        IVF_PAIR_PROBES,
        IVF_TARGET_LIST,
        PAIR_SAMPLE_MAX,
    )

    def sizing(n_rows):
        k_wanted = max(
            8, -(-(IVF_PAIR_PROBES * n_rows) // IVF_TARGET_LIST))
        sample_n = min(PAIR_SAMPLE_MAX, max(IVF_SAMPLE, 8 * k_wanted))
        return sample_n, min(k_wanted, sample_n // 8)

    # 200k (the r10 evidence corpus): sample stays at IVF_SAMPLE and
    # K at the corpus-anchored value — continuity with r9/r10 rows
    s, k = sizing(200_000)
    assert s == IVF_SAMPLE and k == 196
    # 800k (the old capped regime): K now uncapped at the wanted value
    s, k = sizing(800_000)
    assert k == 782 and s == 8 * 782
    # past the ceiling the cap returns, 4x further out than before
    s, k = sizing(4_000_000)
    assert s == PAIR_SAMPLE_MAX and k == PAIR_SAMPLE_MAX // 8


def test_hot_cluster_still_splits_under_capped_k():
    """The floor must not blind the splitter to a REAL hot list: pile
    half the sample into one tight cluster and that centroid's
    ownership exceeds 2x the mean, so the split fires."""
    import numpy as np

    from mqtt_influx_storage_service_spark.operators.similarity import (
        IVF_PAIR_PROBES,
        _split_hot_centroids,
    )

    sample, C, target_share = _capped_regime(n_rows=4_000_000)
    hot = np.tile(sample[:1], (len(sample), 1)) + 1e-3 * np.arange(
        len(sample)
    ).reshape(-1, 1)
    hot /= np.linalg.norm(hot, axis=1, keepdims=True)
    skewed = np.concatenate([sample, hot])
    out = _split_hot_centroids(skewed, C, target_share, IVF_PAIR_PROBES)
    assert len(out) > len(C), "hot cluster was not split"


def test_pair_tier_band_contract_above_gate(spark, monkeypatch):
    """VERDICT r11 #2 (enforce the measured recall contract): above
    GEMM_EXACT_MAX a requested threshold below PAIR_BAND_MIN sits in
    the band where the IVF pair tier measured 0.21-0.49 recall at
    800k vectors (STRESS_r11 `pair_threshold_curve`), so the call
    must REFUSE by default with the curve citation instead of
    silently returning <50% of qualifying pairs. below_band='exact'
    stays the recall-1.0 escape (identical rows to the below-gate
    exact kernel); below_band='approx' accepts the measured sub-band
    recall knowingly; an in-band threshold proceeds on the IVF tier
    unprompted. The registered entries declaring 0.4
    (sim_threshold_pairs, dedup_embedding_cosine,
    dedup_threshold_sweep's 0.30 materialization) inherit the refusal."""
    import pytest

    from mqtt_influx_storage_service_spark.operators import dedup as D
    from mqtt_influx_storage_service_spark.operators import similarity as S

    exact_04 = {
        (r.id_a, r.id_b, r.cosine)
        for r in S._gemm_threshold_pairs(spark, SF001, 0.4).collect()
    }
    assert len(exact_04) > 0
    monkeypatch.setattr(S, "GEMM_EXACT_MAX", 0)
    with pytest.raises(ValueError, match="pair_threshold_curve"):
        S._gemm_threshold_pairs(spark, SF001, 0.4)
    with pytest.raises(ValueError, match="competence band"):
        S.sim_threshold_pairs(spark, SF001)
    with pytest.raises(ValueError, match="competence band"):
        D.dedup_embedding_cosine(spark, SF001)
    with pytest.raises(ValueError, match="competence band"):
        D.dedup_threshold_sweep(spark, SF001)
    escaped = {
        (r.id_a, r.id_b, r.cosine)
        for r in S._gemm_threshold_pairs(
            spark, SF001, 0.4, below_band="exact"
        ).collect()
    }
    assert escaped == exact_04
    approx = {
        (r.id_a, r.id_b, r.cosine)
        for r in S._gemm_threshold_pairs(
            spark, SF001, 0.4, below_band="approx"
        ).collect()
    }
    # exact verify forbids false pairs on the approx tier too
    assert approx <= exact_04
    # in-band threshold needs no escape hatch (collect proves no raise;
    # the near-orthogonal fixture has no pairs at 0.7, which is itself
    # the contract: refusal is about RECALL, not emptiness)
    inband = S._gemm_threshold_pairs(spark, SF001, S.PAIR_BAND_MIN)
    assert {(r.id_a, r.id_b) for r in inband.collect()} <= {
        (a, b) for a, b, _ in exact_04
    }


def test_pair_lloyd_matmul_matches_broadcast_form(spark):
    """ADVICE r11: the pair-tier trainer `_lloyd_pairs` (matmul-form
    squared distances) must reproduce the broadcast-difference-form
    `mlops._lloyd` BIT-FOR-BIT on the actual fixture training sample
    (same seed, same iterations) — a near-tie argmin flip between the
    two float orderings would silently drift fixture-scale
    dedup_semantic_ivf rows (cluster/cos_c/kept) that the below-gate
    pin derives from `_pair_centroids` itself."""
    import numpy as np

    from mqtt_influx_storage_service_spark.operators import mlops as M
    from mqtt_influx_storage_service_spark.operators import similarity as S
    from mqtt_influx_storage_service_spark.sources import load_table
    from mqtt_influx_storage_service_spark.sources.tables import (
        table_row_count,
    )

    emb = load_table(spark, SF001, "embeddings", rebalance=True)
    n = table_row_count(SF001, "embeddings")
    sample, k = S._pair_training_sample(emb, n)
    assert len(sample) > 0 and k >= 8
    assert np.array_equal(S._lloyd_pairs(sample, k=k), M._lloyd(sample, k=k))


def test_pair_tier_explicit_exact_wins_in_band(spark, monkeypatch):
    """r12 review findings: (a) below_band='exact' must route to the
    recall-1.0 kernel even for an IN-band threshold above the gate
    (the IVF tier measures 0.7559 recall in [0.6,0.7) — a caller who
    explicitly paid for exactness must not silently get the miner);
    (b) a misspelled below_band fails loudly instead of falling back
    to refusal."""
    import pytest

    from mqtt_influx_storage_service_spark.operators import similarity as S

    exact_06 = {
        (r.id_a, r.id_b, r.cosine)
        for r in S._gemm_threshold_pairs(spark, SF001, 0.45).collect()
        if r.cosine >= S.PAIR_BAND_MIN
    }
    monkeypatch.setattr(S, "GEMM_EXACT_MAX", 0)
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in S._gemm_threshold_pairs(
            spark, SF001, S.PAIR_BAND_MIN, below_band="exact"
        ).collect()
    }
    assert got == exact_06
    with pytest.raises(ValueError, match="below_band='Exact'"):
        S._gemm_threshold_pairs(spark, SF001, 0.4, below_band="Exact")


def test_lsh_planes_geometry():
    """VERDICT r12 #1 (the r8 _ivf_k lesson): the plane count derives
    from corpus size above the gate — fixture geometry at or below it
    (every oracle-checked scale), ceil(log2(n/target)) clamped to
    [6, 24] above. The scanned corpus share (1+p+C(p,2))/2^p must FALL
    as the corpus grows — the defect being fixed was 34% of 800k."""
    from mqtt_influx_storage_service_spark.operators import similarity as S

    # at/below the gate: the oracle-checked fixture geometry, untouched
    assert S._lsh_planes(2_000) == S.LSH_PLANES
    assert S._lsh_planes(20_000) == S.LSH_PLANES
    assert S._lsh_planes(S.LSH_SCALE_GATE) == S.LSH_PLANES
    # above: corpus-scaled, monotone, capped
    p800k = S._lsh_planes(800_000)
    assert p800k == 13
    assert S._lsh_planes(10**9) == 23
    assert S._lsh_planes(10**12) == S.LSH_PLANES_MAX
    prev = 0
    for n in (2 * 10**5, 10**6, 10**7, 10**8, 10**9):
        p = S._lsh_planes(n)
        assert p >= prev
        prev = p

    def share(p):
        return (1 + p + p * (p - 1) // 2) / (1 << p)

    # the fix's whole point: scanned share at 800k drops ~30x vs the
    # fixed 6-plane geometry (0.34 -> ~0.011)
    assert share(p800k) < share(S.LSH_PLANES) / 20


def test_ann_lsh_above_gate_clustered_recall(spark, tmp_path, monkeypatch):
    """Above-gate functional pin: on a CLUSTERED corpus (the regime the
    scaled geometry targets — near-dup neighbors, per-plane agreement
    >0.99) the derived >6-plane bucketing keeps recall@5 >= 0.9 against
    the exact scan. Gate and target are monkeypatched down so the test
    corpus (5k vectors, 100 clusters of 50 near-duplicates) exercises
    the scaled branch (9 planes) at unit-test cost."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mqtt_influx_storage_service_spark.operators import similarity as S

    rng = np.random.default_rng(42)
    base = rng.normal(0.0, 1.0, size=(100, 64)).astype(np.float32)
    n = 5000
    vecs = np.empty((n, 64), dtype=np.float32)
    for i in range(n):
        vecs[i] = base[i % 100] + rng.normal(0.0, 0.005, 64).astype(
            np.float32
        )
    d = str(tmp_path / "corpus")
    import os

    os.makedirs(d)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array([i % 100 for i in range(n)], pa.int32()),
        }),
        f"{d}/embeddings.parquet",
    )

    monkeypatch.setattr(S, "LSH_SCALE_GATE", 1000)
    monkeypatch.setattr(S, "LSH_TARGET_BUCKET", 16)
    assert S._lsh_planes(n) == 9  # the scaled branch, not fixture's 6

    truth: dict[int, set[int]] = {}
    for r in S.sim_cosine_topk(spark, d).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set[int]] = {}
    for r in S.sim_ann_lsh(spark, d).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert total == 100 * TOPK
    recall = hits / total
    assert recall >= 0.9, f"above-gate clustered recall@5 = {recall:.3f}"
