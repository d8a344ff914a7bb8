"""Deduplication for LLM-data pipelines (Tier C, driver mandate):
exact (hash group-by), n-gram Jaccard near-dup (oracle-checked),
MinHash+LSH (banded candidate generation + exact verification), and
SimHash (hamming-block candidate generation).

Shingling convention shared by every operator here: word 3-shingles
(``w[i] w[i+1] w[i+2]`` joined by single spaces) over whitespace
tokens, deduplicated per document.

Scale notes (100 TB): the all-pairs formulations never materialize the
full cross product — candidate pairs come from an equi-join on a
blocking key (shared shingle / LSH band signature / simhash block),
which Spark executes as an ordinary shuffle join; the verify step is a
second equi-join on the candidate pair. This is the standard
shingle-index near-dup architecture and scales linearly in corpus size
for bounded shingle frequency; a hot shingle (stopword trigram) is the
skew risk, handled by AQE skew-join + a document-frequency cap on
blocking shingles (same trick as stopword removal in IR).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources import load_table
from ..sources.tables import table_row_count

JACCARD_THRESHOLD = 0.5
MINHASH_K = 64          # signature length
MINHASH_BANDS = 16      # 16 bands x 4 rows: P(candidate | j=0.5) ≈ 0.64
MINHASH_PRIME = 2147483647  # 2^31 - 1, Mersenne
SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4      # pigeonhole: hamming <= 3 guarantees a shared block
# Hot-bucket cap for LSH candidate generation (minhash bands + simhash
# blocks): a bucket with more than CAP members generates O(CAP^2) pairs
# from what is almost certainly a degenerate cluster (boilerplate, spam
# bursts) — the candidate-pair analogue of stopword removal. Dropped
# buckets are auditable via :func:`lsh_hot_buckets`, never silent.
LSH_BUCKET_CAP = 64
# Document-frequency cap for BLOCKING shingles in the exact-Jaccard /
# containment candidate stage (VERDICT r8 #1 / STRESS_r08
# dedup_components_100x_FAILURE): the uncapped exploded-shingle
# self-join materializes Σ c(s)² pair partials, and a corpus whose dup
# groups share most of their vocabulary (boilerplate, template farms,
# the 100x stress corpus's per-source shingle overlap at c(s)≈100)
# turns that into billions of rows BEFORE any per-pair trim can run.
# The cap lands BEFORE pair aggregation: a shingle appearing in more
# than CAP documents is skipped for candidate generation (the exact
# LSH_BUCKET_CAP idiom, and IR's stopword removal), bounding the pair
# stage at CAP²/2 rows per shingle key. Jaccard/containment stay EXACT
# because candidates are re-verified against the FULL shingle arrays
# (array_intersect) — the cap only loses pairs whose docs share no
# OTHER under-cap shingle, i.e. pairs connected solely through
# corpus-wide boilerplate. Skipped shingles are auditable via
# :func:`jaccard_hot_shingles`, never silent; the test fixtures' max
# df is 7 (sf0.01) / 25 (sf0.1), so driver oracle hashes are unchanged.
SHINGLE_DF_CAP = 64
# Rescue-tier co-occurrence gate (VERDICT r9 #1): a candidate pair
# bridged ONLY by over-cap (sampled) shingle buckets must land together
# in at least this many sampled buckets. Near-dup pairs share many
# shingles (median 11 over-cap bridges on the 50k cap-engaged stress
# corpus), single-boilerplate coincidences share one — the gate
# measured 99.2% pair recall vs the uncapped DuckDB truth at 1/25th
# the junk-candidate volume of ungated sampling.
RESCUE_COOC_MIN = 2
# Peak-memory bound for the vectorized signature kernels: chunks of the
# Arrow batch are sized so the (64 x flat) intermediate matrices stay
# ~32 MB (cache-friendly, no executor-memory pressure with 32 parallel
# workers) regardless of how many shingles a pathological batch has.
_CHUNK_FLAT = 1 << 16


def _shingles_of_tokens(toks: F.Column) -> F.Column:
    """Distinct word 3-shingles from an already-materialized token
    array COLUMN (not an inline ``split``!). Higher-order lambdas are
    interpreted, not codegen'd, and every reference to an inline
    subexpression re-executes it per element — with ``split`` inlined,
    the 3 ``element_at`` references re-split the text per shingle
    (measured 0.77s vs 0.18s at sf0.1, and >5s once a ``when`` guard
    and same-projection ``size()`` alias reference multiplied the
    duplication). Caller guarantees ``size(toks) >= 3``.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        )
    )


_SHINGLES_SQL = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        i -> string_split(text, ' ')[i] || ' ' ||
             string_split(text, ' ')[i+1] || ' ' ||
             string_split(text, ' ')[i+2]))
"""


_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingles, n_shingles) for every doc with >= 3 tokens.

    Strict multi-step projections: tokens materialize once, shingles
    reference the token COLUMN, n_shingles references the shingle
    COLUMN from a parent projection. CollapseProject keeps non-cheap
    aliases referenced more than once as-is, so nothing re-inlines.
    Docs with < 3 tokens have no shingles and cannot join any pair —
    dropping them here is semantics-preserving for every consumer.

    The result is persisted: every consumer reads it at least twice
    (candidate generation + exact-Jaccard verify, or explode + count
    lookup), and shingling is the expensive leg of those pipelines —
    measured ~40% off dedup_minhash_lsh at sf0.1. The persisted handle
    is registered in ``_SHINGLE_CACHE`` (one entry per (app, sf_dir))
    so :func:`release_shingles` can unpersist deterministically — a
    long-lived service otherwise pins executor memory per sf_dir
    forever. At 100 TB the same role is played by checkpointing the
    shingle table once per dedup campaign and deleting it after.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    out = _shingles_df(docs).persist()
    _SHINGLE_CACHE[key] = out
    return out


def _shingles_df(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles, n_shingles) for any (doc_id, text) frame —
    the un-cached core of :func:`_doc_shingles`, also used to shingle
    incoming micro-batches in the streaming near-dup screen."""
    tokens = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= 3)
    shingled = tokens.select(
        "doc_id", _shingles_of_tokens(F.col("toks")).alias("shingles")
    )
    # shingles_h: the 60-bit md5-prefix hash of every shingle,
    # precomputed ONCE here (the table is persisted per campaign) so
    # no consumer re-runs md5 per subtree evaluation — the candidate
    # explode, the minhash/simhash signature kernels, and the exact
    # verify all read the long array. The verify intersecting LONGS
    # instead of ~25-byte strings is also what keeps the candidate-
    # verify join cheap (measured ~1.2 s -> ~0.3 s for the intersect
    # leg at sf0.1); the DuckDB twins count the identical keyed hash.
    return shingled.select(
        "doc_id",
        "shingles",
        F.size("shingles").alias("n_shingles"),
        F.transform(F.col("shingles"), _shingle_hash64).alias("shingles_h"),
    )


# Campaign caches owned by OTHER modules (e.g. the pipeline tier's
# curated-survivors relation) that must be released with the same
# lifecycle as the shingle/edge/label caches. Registered at import
# time; a plain list avoids a dedup->pipeline import cycle.
_EXTRA_CAMPAIGN_CACHES: list[dict] = []


def _register_campaign_cache(cache: dict) -> None:
    _EXTRA_CAMPAIGN_CACHES.append(cache)


def release_shingles(spark: SparkSession | None = None) -> int:
    """Unpersist every cached shingle table (optionally only those of
    one session) and return how many were released. Call when a dedup
    campaign over an sf_dir is done; safe to call at any time — the
    next consumer just re-persists."""
    released = 0
    for cache in (
        _SHINGLE_CACHE,
        _EDGE_CACHE,
        _LABEL_CACHE,
        _SEM_CACHE,
        _WINDOW_INDEX_CACHE,
        _CAND_CACHE,
        *_EXTRA_CAMPAIGN_CACHES,
    ):
        for key in list(cache):
            if spark is not None and key[0] != spark.sparkContext.applicationId:
                continue
            cache.pop(key).unpersist()
            _CAND_COUNT.pop(key, None)
            released += 1
    # the over-cap statistic rides the same campaign lifecycle (it is
    # a plain bool, not a persisted frame — popped, nothing to
    # unpersist)
    for key in list(_OVERCAP_CACHE):
        if spark is not None and key[0] != spark.sparkContext.applicationId:
            continue
        _OVERCAP_CACHE.pop(key)
    return released


def release_semantic(spark: SparkSession | None = None) -> int:
    """Unpersist only the SemDeDup assignment cache — the bench calls
    this between dedup_semantic reps so they time the plan, not the
    campaign cache (the release_mmr discipline)."""
    released = 0
    for key in list(_SEM_CACHE):
        if spark is not None and key[0] != spark.sparkContext.applicationId:
            continue
        _SEM_CACHE.pop(key).unpersist()
        released += 1
    return released


# --------------------------------------------------------------------------
# Exact dedup (hash group-by on content)
# --------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups: keep min doc_id per identical text.

    ``dropDuplicates(["text"])`` gives the same survivors but with a
    nondeterministic representative; grouping with min() is the
    hash-stable formulation (and what a 100 TB pipeline runs, since it
    also yields the copy count for provenance).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


# --------------------------------------------------------------------------
# N-gram Jaccard near-dup (exact, blocked by shared shingle)
# --------------------------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with 3-shingle Jaccard >= 0.5.

    Plan: explode distinct shingles → bucket-collect per shingle key,
    df-capped with a hash-sampled rescue tier for over-cap buckets
    (see :func:`_shingle_candidates`) → in-bucket pair expansion →
    candidate gate → exact verify against the full shingle arrays
    (Jaccard = |A∩B| / (|A| + |B| - |A∩B|)). Never forms the cross
    product; the shingle index is the blocking key and the df cap
    bounds the pair stage on boilerplate-heavy corpora (sampled
    buckets audited by :func:`jaccard_hot_shingles`).
    """
    return _jaccard_pairs(spark, sf_dir)


def _shingle_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs from the df-capped
    shingle index — the candidate stage shared by :func:`_jaccard_pairs`
    and :func:`dedup_containment` (VERDICT r8 #1, rescue tier r10 #1).

    Two tiers, one plan:

    - **under-cap** (shingle df <= SHINGLE_DF_CAP): every member kept,
      one shared shingle suffices — byte-identical semantics to the r9
      capped stage, so corpora with no over-cap shingles (both test
      fixtures: max df 25) produce identical candidates and hashes.
    - **rescue** (df > SHINGLE_DF_CAP): the bucket is SAMPLED to its
      SHINGLE_DF_CAP+1 smallest members by the per-shingle hash
      xxhash64(shingle, doc_id) — decorrelated across shingles, so a
      near-dup pair gets an independent ~ (CAP/df)² chance per shared
      over-cap shingle — and a pair bridged ONLY by over-cap shingles
      must co-occur in >= RESCUE_COOC_MIN sampled buckets. Real
      near-dups share MANY shingles (measured median 11 over-cap
      bridges on the 50k cap-engaged corpus) while one-boilerplate
      coincidences share one, so the co-occurrence gate keeps ~99% of
      the lost pairs for ~4% of the raw sampled-pair volume
      (measured: recall 0.948 → 0.992 vs the uncapped DuckDB truth;
      junk candidates 36M → 1.4M at the 50k corpus).

    Plan: explode (8-byte md5-prefix shingle keys) → ONE shuffle by
    shingle feeding BOTH a rank window (sorted, Tungsten-spillable —
    no unbounded collect_list buffer ever materializes an over-cap
    bucket, per ADVICE r9) and, exchange-reused, the bucket collect of
    the rank-filtered rows (arrays bounded at CAP+1 by construction)
    → in-bucket sorted pair expansion (<= (CAP+1)·CAP/2 rows per
    bucket) → ONE pair-keyed aggregation replacing the old distinct
    (max(under_cap) OR cooc >= RESCUE_COOC_MIN), map-side partial.
    Total exchanges: 2 (shingle, pair) — same as the r9 plan.

    Measured dead end kept for the record (sf1.0 stress corpus,
    local[32], the pre-cap self-join era): AllPairs-style prefix
    filtering (Bayardo et al., WWW'07 — index only each doc's
    ``n - ceil(t*n) + 1`` rarest-by-df shingles) ran 2x SLOWER
    end-to-end (42.7s vs 20.9s for the pair step) because the df-rank
    window added two more exploded-table shuffles while uniform c(s)
    only dropped candidates ~4x. The df CAP gets the same protection
    for one linear aggregation.
    """
    ds = _doc_shingles(spark, sf_dir)
    exploded = ds.select("doc_id", F.explode("shingles_h").alias("shingle"))
    # rank ties broken by doc_id: fully deterministic sample
    rank_w = Window.partitionBy("shingle").orderBy(
        F.xxhash64("shingle", "doc_id"), "doc_id"
    )
    kept = exploded.withColumn("rk", F.row_number().over(rank_w)).filter(
        F.col("rk") <= SHINGLE_DF_CAP + 1
    )
    # size == CAP+1 means the rank filter truncated the bucket — an
    # over-cap (sampled) bucket; <= CAP means the bucket is complete
    buckets = (
        kept.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("members"))
        .filter(F.size("members") >= 2)
        .select(
            F.array_sort("members").alias("members"),
            (F.size("members") <= SHINGLE_DF_CAP).alias("under_cap"),
        )
    )
    pair_col = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_col).alias("p"), "under_cap")
        .select("p.doc_a", "p.doc_b", "under_cap")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("under_cap").alias("has_under_cap"),
            F.count(F.lit(1)).alias("cooc"),
        )
        .filter(F.col("has_under_cap") | (F.col("cooc") >= RESCUE_COOC_MIN))
        .select("doc_a", "doc_b")
    )


def jaccard_hot_shingles(
    spark: SparkSession, sf_dir: str, cap: int = SHINGLE_DF_CAP
) -> DataFrame:
    """Audit view of the blocking shingles :func:`_shingle_candidates`
    SAMPLES under the df cap (r10: over-cap buckets are no longer
    skipped outright — they keep their CAP+1 smallest-by-hash members
    and pairs must co-occur in >= RESCUE_COOC_MIN of them): (shingle,
    df) for every shingle appearing in more than ``cap`` documents
    (twin of :func:`lsh_hot_buckets` — truncation is never silent).
    Keyed by the shingle STRING, not the hash, so a campaign can read
    what the boilerplate actually says. Empty on the test fixtures
    (max df 7 at sf0.01 / 25 at sf0.1)."""
    return (
        _doc_shingles(spark, sf_dir)
        .select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
    )


# Grid-verify gates (VERDICT r12 #4). The per-pair verify ships BOTH
# docs' shingle arrays once per candidate pair: at the 100x stress
# corpus (500k docs, 55.8M candidates = 112 pairs/doc) that was a
# measured 6.2 GB exchange — 69% of dedup_ngram_jaccard's 9.0 GB
# shuffle — because the pairs+sh_a intermediate re-shuffles fat by
# doc_b. The grid plan partitions pairs ONCE by (cell_a, cell_b) =
# (hash(doc_a) % B, hash(doc_b) % B) and replicates each doc's array
# to B cells per side, so arrays ship B times per DOC instead of once
# per PAIR and the fat intermediate never crosses an exchange (the
# subset-co-partitioning conf in session.tune() is what lets Spark
# elide it). Grid bytes ~ 2·B·docs·array + pairs·slim vs per-pair
# bytes ~ pairs·array: the grid only wins when candidate multiplicity
# exceeds ~2B, and a low-dup-rate corpus (multiplicity ~1-2, the
# realistic 100 TB case) would pay B× MORE — so the plan is chosen
# from the MEASURED multiplicity, not corpus size alone: above the
# doc-count gate the candidate set is persisted (campaign idiom, same
# keyed-cache discipline as _doc_shingles; at 100 TB this is the
# checkpoint-the-candidates step every dedup campaign already has)
# and counted, and the grid engages only at multiplicity >=
# VERIFY_GRID_MIN_MULT. Below the gate nothing changes: no persist,
# no count job, byte-identical fixture plans.
VERIFY_GRID_GATE = 100_000   # docs; sf0.01/sf0.1 stay on the plain path
VERIFY_GRID_B = 8            # replication per side; byte win needs mult > 2B
# The BYTE break-even is 2B, but the measured WALL break-even sits far
# higher: the persist+count barrier serializes the candidate and
# verify stages the plain pipeline overlaps, so near the byte
# break-even the grid trades real wall for a marginal shuffle cut
# (measured at the 100x corpus: dedup_minhash_lsh, multiplicity 25.1 —
# grid 53.9 s / -6% bytes vs plain 32.5 s). 8B keeps the grid for the
# regime it measurably wins: >= 4x byte cut on the verify legs
# (dedup_ngram_jaccard at multiplicity 112: -36% total bytes, -27%
# wall).
VERIFY_GRID_MIN_MULT = 64
VERIFY_GRID_B_MAX = 64   # replication cap: 4096 cells, the √P bound

_CAND_CACHE: dict[tuple, DataFrame] = {}   # (appId, sf_dir, tag) -> persisted
_CAND_COUNT: dict[tuple, int] = {}

# (appId, sf_dir) -> bool: does the corpus contain ANY shingle with
# df > SHINGLE_DF_CAP? The runtime statistic behind the r15 exact-count
# verify fork (see _scored_shingle_pairs). Measured once per campaign
# (one map-combinable aggregation over the exploded shingle index,
# the same one-count-job-per-campaign budget as _persisted_candidates)
# and released with the campaign caches.
_OVERCAP_CACHE: dict[tuple[str, str], bool] = {}


def _corpus_has_overcap(spark: SparkSession, sf_dir: str) -> bool:
    """True iff any blocking shingle's document frequency exceeds
    SHINGLE_DF_CAP — i.e. the df cap's sampled rescue tier is LIVE for
    this corpus and candidate co-occurrence counts can undercount true
    intersections. Exactness matters (a false 'clean' would publish
    wrong n_inter values), so this is a full count over the campaign's
    persisted shingle relation, not a sample; memoized per campaign."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _OVERCAP_CACHE.get(key)
    if cached is None:
        ds = _doc_shingles(spark, sf_dir)
        cached = not (
            ds.select(F.explode("shingles_h").alias("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > SHINGLE_DF_CAP)
            .isEmpty()
        )
        _OVERCAP_CACHE[key] = cached
    return cached


def _persisted_candidates(
    spark: SparkSession, sf_dir: str, tag: str, cand: DataFrame
) -> tuple[DataFrame, int]:
    """Persist + count a candidate pair set once per (app, sf_dir, tag)
    campaign — the runtime statistic the verify-plan choice needs.
    Released by :func:`release_shingles`.

    TAG CONTRACT (ADVICE r13): one tag == one candidate BUILDER. The
    cache key ignores the passed ``cand`` plan on a hit, so every
    caller reusing a tag must construct the same candidate DataFrame
    for the same (app, sf_dir) — today 'shingle' is built only by
    :func:`_shingle_candidates` (shared by design between the jaccard
    and containment pipelines: campaign reuse IS the point) and
    'banded' only by the minhash band join. A new verify caller must
    mint a NEW tag, not reuse one with a different construction —
    silently verifying against another builder's persisted candidates
    is the failure mode this line exists to prevent."""
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    if key not in _CAND_CACHE:
        df = cand.persist()
        _CAND_COUNT[key] = df.count()
        _CAND_CACHE[key] = df
    return _CAND_CACHE[key], _CAND_COUNT[key]


def _grid_cells(col: str, b: int):
    return F.pmod(F.xxhash64(col), F.lit(b)).cast("long")


# Exact cell->partition placement for the grid verify (r14). The grid
# has exactly b² distinct cell keys and b² partitions, and Spark's
# HashPartitioning maps key -> pmod(murmur3(key), n): 64 keys hashed
# into 64 bins is the guide's "synthetic partitioning key with too few
# distinct values" anti-pattern — balls-in-bins puts 0..4 WHOLE cells
# per partition (measured at the 100x corpus: max task = 4 cells =
# 3,987,337 records vs 15,771 median, ~23 empty tasks, and AQE cannot
# rebalance a REPARTITION_BY_NUM exchange). Fix: shuffle on ONE
# synthetic `_cell` column whose VALUES are chosen so that
# pmod(hash(value), b²) is a bijection onto partitions — every
# partition holds exactly one cell. The table is a pure function of
# b² (murmur3 is fixed), found once per process with one bounded
# aggregation over a counting range; memoizing it is hash-search
# reuse, not data/result caching.
_GRID_CELL_MAP: dict[int, list[int]] = {}


def _grid_cell_map(spark: SparkSession, n_cells: int) -> list[int]:
    """n_cells distinct longs m[0..n_cells) with
    pmod(murmur3_hash(m[c]), n_cells) == c — murmur3_hash evaluated by
    Spark itself (F.hash is the same function HashPartitioning uses),
    so the placement can never drift from the engine's."""
    cached = _GRID_CELL_MAP.get(n_cells)
    if cached is not None:
        return cached
    found: dict[int, int] = {}
    start = 0
    while len(found) < n_cells:
        # bounded driver fetch: groupBy caps the result at n_cells
        # rows (<= 4096 by VERIFY_GRID_B_MAX); 64 candidates per bin
        # makes a missing bin ~e^-64 per wave, the loop guards anyway
        rows = (
            spark.range(start, start + 64 * n_cells)
            .select(
                F.col("id"),
                F.pmod(F.hash(F.col("id")), F.lit(n_cells)).alias("p"),
            )
            .groupBy("p")
            .agg(F.min("id").alias("id"))
            .limit(n_cells)
            .collect()
        )
        for r in rows:
            found.setdefault(int(r["p"]), int(r["id"]))
        start += 64 * n_cells
    out = [found[c] for c in range(n_cells)]
    _GRID_CELL_MAP[n_cells] = out
    return out


def _verify_joined(
    cand: DataFrame,
    sa: DataFrame,
    sb: DataFrame,
    *,
    spark: SparkSession | None = None,
    sf_dir: str | None = None,
    tag: str | None = None,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs joined to both docs' shingle
    arrays, join strategies PINNED — the scale contract of every
    candidates→verify pipeline in this module:

    - join 1 builds a SHUFFLE_HASH table on the CANDIDATE side: id
      pairs, ~16 bytes a row, per-partition-bounded at any corpus
      size, and nothing wide gets sorted;
    - join 2 is SORT_MERGE against the corpus shingle table: both
      sides are wide (shingle arrays), and SMJ is the spill-safe
      strategy — the sort is linear and Tungsten spills it.

    Left to its static stats Catalyst BROADCASTS both sides here: the
    post-aggregate candidate subtree estimates tiny at any actual
    size, and the corpus shingle table follows it into a static
    BroadcastExchange — which is corpus-sized and can never be a
    broadcast side (measured: 8 GiB driver OOM at the 500k-doc stress
    corpus; AQE cannot demote a static broadcast whose input has no
    shuffle stage to measure, so the only honest fix is the pin).

    Above ``VERIFY_GRID_GATE`` docs AND measured candidate
    multiplicity >= ``VERIFY_GRID_MIN_MULT``, the per-pair plan is
    swapped for the GRID verify (see the gate comment above): same
    equi-join semantics — the cell columns are deterministic
    functions of the join keys, so each (pair, replica) row matches
    exactly one array row per side and the output multiset is
    row-identical (pinned by the forced-grid equality test) — but
    arrays shuffle B-per-doc instead of once-per-pair and the fat
    intermediate stays put. Callers opt in by passing spark / sf_dir /
    tag; the streaming screen (micro-batch sized) never does.
    """
    if spark is None or sf_dir is None or tag is None:
        return (
            cand.hint("shuffle_hash")
            .join(sa, "doc_a")
            .join(sb.hint("merge"), "doc_b")
        )
    n_docs = table_row_count(sf_dir, "documents")
    if n_docs <= VERIFY_GRID_GATE:
        return (
            cand.hint("shuffle_hash")
            .join(sa, "doc_a")
            .join(sb.hint("merge"), "doc_b")
        )
    cand_p, n_pairs = _persisted_candidates(spark, sf_dir, tag, cand)
    try:
        conf_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        conf_part = spark.sparkContext.defaultParallelism
    # b grows with the session's shuffle parallelism (r13 census
    # finding, adjudicated by the isolate mode's own work quantiles):
    # the grid has exactly b² distinct cell keys, so a static b caps
    # the verify at b² tasks on ANY cluster — and partitioning the b²
    # keys into MORE partitions than cells just mints empty tasks
    # (the first cut used 4b² partitions: 75% of the stage's tasks
    # did nothing and the empty median read every occupied task as a
    # 600x straggler). The geometry here: b² >= 2× the configured
    # shuffle parallelism, so occupied partitions cover the cluster's
    # cores with a couple of task waves. Replication is the
    # classic all-pairs √P bound — b doubles with cluster size up to
    # the cap, so the multiplicity break-even (8b) rises with it and
    # the gate check uses the derived b.
    b = VERIFY_GRID_B
    while b < VERIFY_GRID_B_MAX and b * b < 2 * conf_part:
        b *= 2
    if n_pairs < (VERIFY_GRID_MIN_MULT * b // VERIFY_GRID_B) * n_docs:
        return (
            cand_p.hint("shuffle_hash")
            .join(sa, "doc_a")
            .join(sb.hint("merge"), "doc_b")
        )
    # n_part = b² (one cell per partition): partitions beyond b² can
    # only be empty, and merging cells into fewer partitions doubles
    # the per-partition SMJ sort volume — spill-safety margin matters
    # more than task-count cosmetics (measured at the 100x corpus,
    # b=8: ~96 MB/partition sorts; the 2-cells-per-partition variant
    # sorted ~190 MB into the same memory the persisted candidates
    # already pin).
    #
    # Cell PLACEMENT (r14): the grid shuffles on ONE synthetic `_cell`
    # column — an injective remap of (_ca, _cb) through the
    # _grid_cell_map table — so HashPartitioning lands exactly one
    # cell per partition. Hashing the raw (_ca, _cb) pair (b² distinct
    # keys into b² partitions) was balls-in-bins: the 100x census
    # flagged the verify stage at work ratio 252 (4 whole cells in the
    # max task, ~23 empty tasks) every round since r12, and AQE cannot
    # rebalance a REPARTITION_BY_NUM exchange. _cell is a
    # deterministic injective function of the join keys (_ca, _cb), so
    # the equi-join semantics are byte-identical (the forced-grid
    # equality test pins it).
    n_part = b * b
    cmap = _grid_cell_map(spark, n_part)
    cmap_arr = F.array(*[F.lit(v).cast("long") for v in cmap])

    def _cell(ca, cb):
        return F.get(cmap_arr, (ca * F.lit(b) + cb).cast("int"))

    replicas = F.explode(
        F.array(*[F.lit(i).cast("long") for i in range(b)])
    )
    pairs = cand_p.withColumn(
        "_cell", _cell(_grid_cells("doc_a", b), _grid_cells("doc_b", b))
    ).repartition(n_part, "_cell")
    sar = (
        sa.withColumn("_r", replicas)
        .withColumn("_cell", _cell(_grid_cells("doc_a", b), F.col("_r")))
        .drop("_r")
        .repartition(n_part, "_cell")
    )
    sbr = (
        sb.withColumn("_r", replicas)
        .withColumn("_cell", _cell(F.col("_r"), _grid_cells("doc_b", b)))
        .drop("_r")
        .repartition(n_part, "_cell")
    )
    # merge, not shuffle_hash: both grid joins run with the persisted
    # candidate set pinning storage memory, and an SHJ build per
    # partition failed to acquire execution memory at the 100x corpus
    # (measured: cannotAcquireMemoryToBuildUnsafeHashedRelation with
    # 32 concurrent builds against the 8 GiB unified pool). SMJ's
    # partition-LOCAL sorts are Tungsten-spillable and the
    # co-partitioning still elides every fat exchange — sort is the
    # only cost the merge adds, and it never crosses the wire.
    return (
        pairs.join(sar.hint("merge"), ["_cell", "doc_a"])
        .join(sbr.hint("merge"), ["_cell", "doc_b"])
        .drop("_cell")
    )


def _scored_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, cooc, n_a, n_b) for every pair sharing >= 1
    shingle, where ``cooc`` is the number of SHARED shingles — the r15
    exact-count verify fork (guide §2.3 "shuffle keys and metadata
    instead of payloads", §8's lightweight-proxy rule).

    VALID ONLY when :func:`_corpus_has_overcap` is False: with every
    shingle's df <= SHINGLE_DF_CAP, every bucket is complete, so the
    per-pair bucket co-occurrence count IS |A ∩ B| exactly — the
    number the per-pair verify re-derives by shipping both docs' full
    hash arrays through the join and running array_intersect. The r14
    stage census measured that verify at sf0.1 as an 86.8 MB shuffle
    of pair×array rows plus ~14-20 s of executor CPU, to re-compute a
    count the candidate aggregation had already produced for the
    rescue gate and thrown away. Callers gate on the memoized
    statistic and fall back to the candidates→array-verify plan (and
    the grid above VERIFY_GRID_GATE) whenever the rescue tier is live,
    where sampled buckets make cooc an undercount.

    Plan: one explode (carrying n_shingles — +4 B on the exploded
    exchange buys both Jaccard denominators with no join back), one
    shingle-keyed bucket collect (bounded at SHINGLE_DF_CAP members by
    the gate's premise, so the ADVICE-r9 unbounded-collect hazard is
    void and no rank window / sort is needed), in-bucket sorted pair
    expansion, one map-side-combinable pair aggregation. TWO exchanges
    end-to-end and no array ever crosses the wire — on clean corpora
    this beats even the grid verify, which still replicates arrays
    B-per-doc. Collision exposure: a 60-bit hash collision WITHIN one
    doc would double-count one pair co-occurrence (P ~ n_shingles²/2⁶¹
    per doc) — the same accepted exposure as array_intersect over the
    same hash arrays and the keyed-count DuckDB twins.
    """
    ds = _doc_shingles(spark, sf_dir)
    exploded = ds.select(
        "doc_id",
        F.col("n_shingles").alias("n_sh"),
        F.explode("shingles_h").alias("shingle"),
    )
    buckets = (
        exploded.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("members"))
        .filter(F.size("members") >= 2)
        .select(F.array_sort("members").alias("members"))
    )
    pair_col = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_col).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n_sh").alias("n_a"),
            F.col("p.b.n_sh").alias("n_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("cooc"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with Jaccard >= threshold among docs sharing at least
    one under-cap blocking shingle: capped candidate generation
    (:func:`_shingle_candidates`) + EXACT verification against the
    full shingle arrays — the same candidates→verify architecture as
    :func:`dedup_minhash_lsh`, so the pair stage is bounded by
    SHINGLE_DF_CAP²/2 per shingle key instead of Σ c(s)².

    n_inter = ``array_intersect`` on the precomputed 60-bit HASH
    arrays (``shingles_h`` — 8-byte elements, not ~25-byte strings:
    the intersect leg measured ~4x cheaper and the verify shuffle
    ~3x lighter): exactly the keyed count the DuckDB twin computes.
    A cross-shingle collision would over-count n_inter by 1 with
    P ≈ n_shingles²/2⁶¹ per pair (~10⁻¹² at 1k-shingle docs) — the
    same accepted exposure as every signature pipeline here. The
    verify join shuffles hash arrays for candidate-many rows only —
    collision-bounded, never corpus².

    The verify joins are strategy-PINNED (see :func:`_verify_joined`):
    Catalyst's static size estimate for the post-aggregate candidate
    subtree lands under the broadcast threshold at ANY corpus scale,
    and the resulting static BroadcastExchange of the corpus-sized
    shingle table killed the 8 GiB driver at the 100x stress corpus
    (AQE cannot demote a statically planned broadcast whose input has
    no shuffle stage to measure — the r8 minhash run survived only
    because the persisted shingle cache happened to materialize first).

    r15 exact-count fork: when the campaign's measured df histogram has
    NO over-cap shingle (:func:`_corpus_has_overcap` — true at every
    fixture SF, max df 25), the candidate stage's co-occurrence count
    already equals n_inter for every pair, so the whole verify join is
    a re-derivation and is skipped (see :func:`_scored_shingle_pairs`
    for the proof obligations). Boilerplate corpora — where the rescue
    tier samples buckets and cooc undercounts — keep this full
    candidates→array-verify plan, including the grid above the gate.
    """
    if not _corpus_has_overcap(spark, sf_dir):
        p = _scored_shingle_pairs(spark, sf_dir)
        return (
            p.withColumn("n_inter", F.col("cooc").cast("int"))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
        )
    ds = _doc_shingles(spark, sf_dir)
    sa = ds.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles_h").alias("sh_a"),
        F.col("n_shingles").alias("n_a"),
    )
    sb = ds.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles_h").alias("sh_b"),
        F.col("n_shingles").alias("n_b"),
    )
    jac = (
        _verify_joined(
            _shingle_candidates(spark, sf_dir), sa, sb,
            spark=spark, sf_dir=sf_dir, tag="shingle",
        )
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return jac.select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH ds AS (
    SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
), exploded AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS shingle
    FROM (SELECT doc_id, unnest(shingles) AS s FROM ds)
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM exploded a JOIN exploded b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
), counts AS (
    SELECT doc_id, len(shingles) AS n_shingles FROM ds
)
SELECT doc_a, doc_b, n_inter,
       ca.n_shingles AS n_a, cb.n_shingles AS n_b,
       round(n_inter / (ca.n_shingles + cb.n_shingles - n_inter), 6) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE round(n_inter / (ca.n_shingles + cb.n_shingles - n_inter), 6)
      >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Connected components — near-dup pairs -> dup GROUPS
# --------------------------------------------------------------------------

# Fixed propagation depth for the lazy connected-components query: R
# rounds of min-label propagation over the self-looped adjacency reach
# every node within distance R of its component's min-id node. Near-dup
# clusters are star-like (pairs are generated by SHARED content, so the
# min-id doc pairs directly with almost everything in its cluster —
# fixture max eccentricity from the min-id node is 1 at sf0.01 AND
# sf0.1; tests pin that one extra round is a fixpoint). R=5 leaves 4
# hops of margin; adversarial chain-dup corpora use
# :func:`dedup_components_converged`, the driver-loop variant.
#
# Each round references the label table exactly ONCE (join + min-agg) —
# plan growth is LINEAR in R. The tempting pointer-jumping/doubling
# variant (label <- label(label), covers 2^R) references it 2-3x per
# round, which copies the base subtree 4^R times into the logical plan;
# Spark executes each un-cached copy separately (measured 117s -> 430s
# at sf0.01 on the doubling form vs ~linear cost on this one).
CC_ROUNDS = 5

_EDGE_CACHE: dict[tuple, DataFrame] = {}  # (appId, sf_dir[, "self"])


# Per-node propagation-edge cap (VERDICT r4 #5): dup-group edge count
# is quadratic in group size (a 100-member boilerplate cluster emits
# 4 950 pairs), and every propagation round re-joins the whole edge
# set, so group fan-out multiplies CC cost by g²·CC_ROUNDS. Each node
# keeps its EDGE_CAP best edges (weight DESC — exact dups at 1.0 rank
# above near-dups — then dst ASC) PLUS, unconditionally, its
# smallest-id neighbor: within a dup group every member adjacent to
# the group minimum keeps that edge, so the min-label star survives
# any trim. A trimmed graph can in principle split a component whose
# connectivity relied ONLY on >cap-degree nodes' dropped edges
# (synthetic adversarial chains through dense hubs); the audit view
# :func:`component_edge_trim` makes every trimmed node visible, and
# the fixtures (max degree < cap) are untouched — driver hashes
# unchanged.
EDGE_CAP = 8


def _dup_edges_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDGE_CAP-free symmetric weighted edges (src, dst, w): Jaccard
    >= 0.5 pairs (w = jaccard) UNION exact-text duplicate pairs
    (w = 1.0; short docs have no shingles, so identical <3-token docs
    only appear via the exact leg). "Uncapped" refers to the per-node
    EDGE trim only — the pair GENERATION stage underneath is
    df-capped via :func:`_shingle_candidates` (VERDICT r8 #1), which
    is what keeps this subtree alive on boilerplate-dense corpora."""
    jac = _jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.col("jaccard").alias("w")
    )
    docs = load_table(spark, sf_dir, "documents")
    rep = F.min("doc_id").over(Window.partitionBy("text"))
    exact = (
        docs.select("doc_id", rep.alias("rep"))
        .filter(F.col("rep") < F.col("doc_id"))
        .select(
            F.col("rep").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.lit(1.0).alias("w"),
        )
    )
    und = jac.unionByName(exact)
    # symmetrize by EXPLODING both directions out of each undirected
    # row, not by self-union: a union references the (expensive
    # jaccard-join) subtree twice and Spark evaluates each copy
    # separately — explode duplicates rows, not the subtree.
    return und.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"),
                    F.col("doc_b").alias("dst"),
                    F.col("w").alias("w"),
                ),
                F.struct(
                    F.col("doc_b").alias("src"),
                    F.col("doc_a").alias("dst"),
                    F.col("w").alias("w"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.w")


def _dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric near-dup edge list ``(src, dst)``, per-node capped to
    EDGE_CAP best edges + the smallest-id neighbor (see the cap note
    above), then re-symmetrized (a kept direction keeps its reverse, so
    propagation still flows both ways). Duplicate edges between the two
    legs / directions are NOT distinct-ed away: min-propagation is
    idempotent and an edge-level distinct is a full shuffle of the edge
    set at 100 TB for zero semantic gain.

    Persisted via the same keyed-cache discipline as
    :func:`_doc_shingles` (released by :func:`release_shingles`):
    the components loop below reads the edges once per round, and
    recomputing the shingle self-join per round would multiply the
    dominant cost by CC_ROUNDS.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGE_CACHE.get(key)
    if cached is not None:
        return cached
    sym_all = _dup_edges_all(spark, sf_dir)
    # one sorted window pass: row_number and the whole-partition min
    # share (partitionBy, orderBy), so Catalyst evaluates both in a
    # single WindowExec behind a single exchange+sort (plan-pinned in
    # tests/test_plans.py — the two-spec formulation cost a second
    # window pass on every consumer of the edge subtree).
    wsrc = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    kept = (
        sym_all.withColumn("rk", F.row_number().over(wsrc))
        .withColumn(
            "min_dst",
            F.min("dst").over(
                wsrc.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .filter((F.col("rk") <= EDGE_CAP) | (F.col("dst") == F.col("min_dst")))
        .select("src", "dst")
    )
    sym = (
        # re-symmetrize (a kept direction keeps its reverse) by explode,
        # same no-subtree-duplication reasoning as _dup_edges_all
        kept.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"), F.col("dst").alias("dst")
                    ),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        # Hash-partition by the propagation join key BEFORE persisting:
        # the cached layout would otherwise inherit the jaccard join's
        # (much wider) partitioning, and every propagation round would
        # schedule that many near-empty tasks. Partitioning by dst also
        # co-locates the per-round join on the edge side.
        .repartition(F.col("dst"))
        .persist()
    )
    _EDGE_CACHE[key] = sym
    return sym


def component_edge_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit view of the nodes :func:`_dup_edges` TRIMS under EDGE_CAP
    (twin of :func:`lsh_hot_buckets`): (src, degree, n_kept) for every
    node whose degree exceeds the cap. Truncation is never silent —
    empty on the test fixtures; non-empty means dense dup clusters
    whose components should be spot-checked against
    :func:`dedup_components_converged`."""
    deg = (
        _dup_edges_all(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"), F.min("dst").alias("min_dst"))
    )
    return deg.filter(F.col("degree") > EDGE_CAP).select(
        "src",
        "degree",
        # kept = cap best + the min neighbor when it ranked below cap
        F.least(F.col("degree"), F.lit(EDGE_CAP + 1)).alias("n_kept_max"),
    )


_LABEL_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, label) for every node of the edge-induced subgraph,
    label = min doc_id within CC_ROUNDS hops (= the component min for
    dup-shaped graphs; see CC_ROUNDS). Docs outside the subgraph are
    singleton components and are NOT in this table — consumers
    ``coalesce(label, doc_id)`` after a left join, which keeps this
    table candidate-pair-sized (broadcastable) at any corpus scale.

    Persisted (same keyed-cache discipline as :func:`_doc_shingles`,
    released by :func:`release_shingles`): every consumer reads it at
    least twice (size rollup + corpus assignment, or the pipeline's
    broadcast), and each uncached read would re-run the CC_ROUNDS
    join+agg chain.
    """
    key = (spark.sparkContext.applicationId, sf_dir, CC_ROUNDS)
    cached = _LABEL_CACHE.get(key)
    if cached is not None:
        return cached
    sym = _dup_edges(spark, sf_dir)
    nodes = sym.select(F.col("src").alias("doc_id")).distinct()
    # Self-loops make "min over neighbors' labels" include the node's
    # own label, so one join+agg per round is a complete update.
    #
    # The self-looped relation is persisted dst-partitioned in its OWN
    # right (r11, VERDICT r10 #4): the plain union DESTROYS the edge
    # cache's repartition(dst) layout (a Union's output partitioning
    # is unknown), so every propagation round re-shuffled the full
    # edge+loop table — the 100x profile showed one edge-side map
    # stage PER ROUND (~50-70 s executor time each) that this cache
    # removes. Deriving it from the already-persisted ``sym`` makes
    # the double cache-scan cheap, and the extra footprint is E+V
    # rows — candidate-subgraph-sized, same order as the edge cache
    # itself. Registered in _EDGE_CACHE so release_shingles frees it
    # with the campaign.
    skey = (spark.sparkContext.applicationId, sf_dir, "self")
    sym_self = _EDGE_CACHE.get(skey)
    if sym_self is None:
        sym_self = (
            sym.unionByName(
                nodes.select(
                    F.col("doc_id").alias("src"), F.col("doc_id").alias("dst")
                )
            )
            .repartition(F.col("dst"))
            .persist()
        )
        _EDGE_CACHE[skey] = sym_self
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(CC_ROUNDS):
        labels = (
            sym_self.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("dlabel")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("label"))
            .withColumnRenamed("src", "doc_id")
        )
    labels = labels.persist()
    _LABEL_CACHE[key] = labels
    return labels


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the near-dup relation: every document gets
    ``component_id`` = min doc_id reachable through Jaccard/exact-dup
    edges — the missing step between "pairs" and "keep ONE
    representative per dup group" in a training-data pipeline (A near
    B near C must collapse to one survivor even if A and C never pair).

    Fixed-depth min-label propagation — the lazy, bounded-round form
    of the iterated-MapReduce CC family (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14). Each round is one
    equi-join of the (self-looped) edge list against the label table
    plus one min-aggregation — two shuffles of candidate-subgraph-
    sized tables; at 100 TB the subgraph (nodes touched by near-dup
    pairs) is orders of magnitude smaller than the corpus, and the
    corpus itself is touched exactly twice: once to build edges, once
    in the final assignment join. The whole query stays a single lazy
    plan — no driver-side convergence loop, no eager action (the
    verdict's laziness contract).

    The assignment joins are pinned SHUFFLE_HASH with the label/size
    tables as build side (r9 broadcast census): the earlier explicit
    ``F.broadcast(labels)`` assumed labels stay broadcast-small, but
    labels has one row per dup-SUBGRAPH NODE — on a dup-heavy corpus
    (30%+ duplication is normal for crawl data) that is corpus-scale
    and a static broadcast is the same driver-kill class the shingle
    verify had. SHJ keeps the build side per-partition-bounded at any
    scale and costs one corpus shuffle on doc_id, which is the honest
    price of attaching a per-doc label.
    """
    # No rebalance: the only consumer of the corpus side is a doc_id
    # projection feeding the hash exchange of the SHJ below — the
    # round-robin repartition stacked a second full-corpus Exchange
    # directly under it (plan nodes 2+3 of the r14 before-plan) for
    # zero distribution benefit at any scale.
    docs = load_table(spark, sf_dir, "documents")
    labels = _component_labels(spark, sf_dir)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("_sz")
    ).withColumnRenamed("label", "component_id")
    assigned = docs.select("doc_id").join(
        labels.hint("shuffle_hash"), "doc_id", "left_outer"
    ).select(
        "doc_id", F.coalesce("label", "doc_id").alias("component_id")
    )
    return assigned.join(
        sizes.hint("shuffle_hash"), "component_id", "left_outer"
    ).select(
        "doc_id",
        "component_id",
        F.coalesce("_sz", F.lit(1)).alias("component_size"),
        (F.col("doc_id") == F.col("component_id")).alias("is_representative"),
    )


def dedup_components_converged(
    spark: SparkSession, sf_dir: str, max_rounds: int = 32
) -> DataFrame:
    """Driver-loop variant for unbounded component diameter: iterate
    the same round until the label assignment reaches a fixpoint
    (checked with one count per round — an explicit action, so this is
    NOT a registered lazy query; it is what a 100 TB campaign with
    adversarial chain-dups runs). localCheckpoint truncates the
    growing lineage so round k+1 does not re-execute rounds 1..k.
    """
    sym = _dup_edges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    labels = docs.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint()
    for _ in range(max_rounds):
        nbr = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("label").alias("dlabel")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlabel").alias("nbr_label"))
            .withColumnRenamed("src", "doc_id")
        )
        new = (
            labels.join(nbr, "doc_id", "left_outer")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    wcomp = Window.partitionBy("label")
    return labels.select(
        "doc_id",
        F.col("label").alias("component_id"),
        F.count(F.lit(1)).over(wcomp).alias("component_size"),
        (F.col("doc_id") == F.col("label")).alias("is_representative"),
    )


# Shared CTE chain: jaccard edges + exact edges, symmetrized. Used by
# the components oracle and the pipeline oracle.
_EDGES_CTE_SQL = f"""
ds AS (
    SELECT doc_id, {{shingles}} AS shingles FROM documents
), exploded AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS shingle
    FROM (SELECT doc_id, unnest(shingles) AS s FROM ds)
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM exploded a JOIN exploded b USING (shingle)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
), counts AS (
    SELECT doc_id, len(shingles) AS n_shingles FROM ds
), jac AS (
    SELECT doc_a, doc_b FROM inter
    JOIN counts ca ON ca.doc_id = doc_a
    JOIN counts cb ON cb.doc_id = doc_b
    WHERE round(n_inter / (ca.n_shingles + cb.n_shingles - n_inter), 6)
          >= {JACCARD_THRESHOLD}
), exact AS (
    SELECT rep AS doc_a, doc_id AS doc_b FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep
        FROM documents)
    WHERE rep < doc_id
), und AS (
    SELECT * FROM jac UNION ALL SELECT * FROM exact
), edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM und
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM und
), reach(v, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT reach.v, e.dst FROM reach JOIN edges e ON e.src = reach.r
), comp AS (
    SELECT v AS doc_id, min(r) AS component_id FROM reach GROUP BY v
)
"""


def _edges_cte() -> str:
    return _EDGES_CTE_SQL.format(shingles=_SHINGLES_SQL)


DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE {_edges_cte()}
SELECT doc_id, component_id,
       count(*) OVER (PARTITION BY component_id) AS component_size,
       doc_id = component_id AS is_representative
FROM comp
"""


# --------------------------------------------------------------------------
# MinHash + LSH (banded) — candidate generation at scale
# --------------------------------------------------------------------------

def _flat_segments(series: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten an Arrow list column into (flat int64 values, per-row
    lengths) — the layout both signature kernels consume. The only
    per-row Python left is the C-level concatenate of the row buffers;
    all arithmetic downstream is whole-batch NumPy."""
    vals = series.to_numpy()
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=len(vals))
    if len(vals) == 0 or lens.sum() == 0:
        return np.empty(0, dtype=np.int64), lens
    flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in vals])
    return flat, lens


def _row_chunks(offsets: np.ndarray, n: int):
    """Yield (row_start, row_end) windows whose flat size stays under
    ``_CHUNK_FLAT`` elements (always at least one row per window)."""
    start = 0
    while start < n:
        end = start + 1
        while end < n and offsets[end + 1] - offsets[start] < _CHUNK_FLAT:
            end += 1
        yield start, end
        start = end


def _minhash_sig_udf():
    """Vectorized minhash: permutation k is h_k(x) = ((2k+1)*x +
    (k*golden mod p)) mod p over the pre-hashed shingle values; the
    signature slot is min_k. Odd multipliers keep the family
    well-spread; operands stay < 2^63.

    This is a pandas UDF on purpose. The pure-built-in formulation (64
    ``F.aggregate`` folds) builds an expression tree so large that
    codegen degrades AND Catalyst's project-collapse re-inlines the
    whole 64-aggregate array into each of the 16 band expressions —
    measured 16x duplicate evaluation. The kernel is vectorized across
    the WHOLE Arrow batch (no per-row Python): rows flatten into one
    value vector, the (64, m) permutation matrix is computed once per
    chunk, and per-row minima fall out of ``np.minimum.reduceat`` at
    the row offsets. The hashing itself (md5-prefix, _shingle_hash64)
    stays JVM-side, so the UDF is pure int64 arithmetic.
    """
    a = np.arange(MINHASH_K, dtype=np.int64) * 2 + 1
    b = (np.arange(MINHASH_K, dtype=np.int64) * 2654435761) % MINHASH_PRIME

    @pandas_udf("array<long>")
    def _sig(hashed: pd.Series) -> pd.Series:
        flat, lens = _flat_segments(hashed)
        n = len(lens)
        out = np.full((n, MINHASH_K), MINHASH_PRIME, dtype=np.int64)
        if flat.size:
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            for lo, hi in _row_chunks(offsets, n):
                seg = flat[offsets[lo]:offsets[hi]]
                if seg.size == 0:
                    continue
                perms = (a[:, None] * seg[None, :] + b[:, None]) % MINHASH_PRIME
                rows = np.flatnonzero(lens[lo:hi]) + lo
                starts = offsets[rows] - offsets[lo]
                out[rows, :] = np.minimum.reduceat(perms, starts, axis=1).T
        return pd.Series(list(out))

    return _sig


def _shingle_hash64(s: F.Column) -> F.Column:
    """60-bit integer hash of a shingle: the first 15 hex chars of its
    md5, as a long. md5 is byte-standardized, so Spark and DuckDB
    produce the SAME integer for the same string (verified incl.
    non-ASCII) — which makes every downstream signature pipeline
    SQL-reproducible, unlike the previous xxhash64 (no DuckDB twin).
    Cryptographic mixing keeps the minhash permutation family and the
    simhash bit votes well-spread; computation stays JVM-side codegen.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


# DuckDB twin of _shingle_hash64 (same integer, see above).
_SHINGLE_HASH64_SQL = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def _with_minhash_signature(ds: DataFrame) -> DataFrame:
    """Add a 64-slot minhash signature column (JVM md5-prefix hash →
    NumPy permutation-min; see :func:`_minhash_sig_udf`)."""
    hashed = ds.withColumn(
        "hashed",
        F.transform(
            F.col("shingles_h"),
            lambda h: F.pmod(h, F.lit(MINHASH_PRIME)),
        ),
    )
    return hashed.withColumn("sig", _minhash_sig_udf()(F.col("hashed"))).drop("hashed")


def _minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_idx, band_sig): the 16 LSH band keys per doc."""
    # _doc_shingles already excludes <3-token docs, so every row has
    # >= 1 shingle; re-filtering on n_shingles would push size(<full
    # shingle expr>) below the projection and re-evaluate it per row.
    return _banded_of(_doc_shingles(spark, sf_dir))


def _banded_of(ds: DataFrame) -> DataFrame:
    """Band keys for any shingle frame (see :func:`_minhash_banded`)."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    sigs = _with_minhash_signature(ds)
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band_idx"),
                    F.concat_ws(
                        "_", F.slice(F.col("sig"), bidx * rows_per_band + 1, rows_per_band)
                    ).alias("band_sig"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_sig")


def lsh_hot_buckets(spark: SparkSession, sf_dir: str, cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Audit view of the buckets :func:`dedup_minhash_lsh` DROPS under
    the hot-bucket cap: (band_idx, band_sig, n_members). Truncation is
    never silent — run this alongside a dedup campaign to quantify it
    (empty on the test fixtures; non-empty means a boilerplate/spam
    cluster that deserves its own handling)."""
    return (
        _minhash_banded(spark, sf_dir)
        .groupBy("band_idx", "band_sig")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > cap)
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding, verified with exact
    Jaccard. Fully oracle-checked (DEDUP_MINHASH_LSH_SQL reproduces the
    md5-prefix hash, the 64 permutations, the banding, and the bucket
    cap), plus recall-vs-exact assertions in tests/test_dedup.py.

    Pipeline: signature (projection) → explode 16 band keys →
    equi-join on (band_idx, band_signature) → distinct candidate pairs
    → exact-Jaccard verify join. This is the 100 TB path: candidates
    scale with collision count, not corpus².
    """
    banded = _minhash_banded(spark, sf_dir)
    # Bucket-collect instead of self-join (same reasoning as
    # dedup_simhash): one evaluation of the signature pipeline, pairs
    # generated inside each band bucket. Bucket membership is bounded by
    # the band collision rate, so the in-bucket expansion stays small; a
    # pathological hot bucket (boilerplate cluster) is CAPPED — skipped
    # for pair generation, surfaced by :func:`lsh_hot_buckets`. A
    # dropped bucket only loses pairs whose docs share no OTHER band,
    # so recall outside the degenerate cluster is untouched
    # (tests/test_dedup.py::test_hot_bucket_cap).
    buckets = (
        banded.groupBy("band_idx", "band_sig")
        .agg(F.collect_list("doc_id").alias("members"))
        .filter(
            (F.size("members") >= 2) & (F.size("members") <= LSH_BUCKET_CAP)
        )
        .select(F.array_sort("members").alias("members"))
    )
    pair_col = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_col).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # exact verification of candidates only
    sh = _doc_shingles(spark, sf_dir)
    sa = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("shingles_h").alias("sh_a"),
                   F.col("n_shingles").alias("n_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("shingles_h").alias("sh_b"),
                   F.col("n_shingles").alias("n_b"))
    verified = (
        # strategy-pinned: see _verify_joined — the corpus shingle
        # table must never land in a static BroadcastExchange
        _verify_joined(
            candidates, sa, sb, spark=spark, sf_dir=sf_dir, tag="banded"
        )
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    # no orderBy: comparison harnesses sort canonically; a global sort
    # here is a pure range-shuffle tax
    return verified.select("doc_a", "doc_b", "jaccard")


def near_dup_screen(
    new_docs: DataFrame,
    corpus_shingles: DataFrame,
    corpus_banded: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Screen a batch of incoming documents against an INDEXED corpus
    (the at-ingest dedup gate of a training-data pipeline: reject or
    flag a crawl batch's near-dups before they enter the corpus).

    ``new_docs``: (doc_id, text). ``corpus_shingles`` /
    ``corpus_banded``: the corpus index (:func:`_doc_shingles` /
    :func:`_minhash_banded` output — persist or materialize them once
    per campaign; the batch side is shingled fresh each call).
    Returns (new_doc_id, corpus_doc_id, jaccard >= threshold).

    Plan shape at scale: the incoming batch is small, so its band keys
    BROADCAST against the corpus band index (an equi-join — the corpus
    is probed, never reshuffled, when the index is bucketed by band
    key on disk); candidates distinct; exact verify via per-pair
    shingle intersection (array_intersect on the two shingle arrays —
    candidates are collision-bounded, so this is a narrow join, not an
    explode).
    """
    nds = _shingles_df(new_docs)
    nbanded = _banded_of(nds)
    cand = (
        F.broadcast(
            nbanded.select(
                F.col("doc_id").alias("new_doc_id"), "band_idx", "band_sig"
            )
        )
        .join(
            corpus_banded.select(
                F.col("doc_id").alias("corpus_doc_id"), "band_idx", "band_sig"
            ),
            ["band_idx", "band_sig"],
        )
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    a = nds.select(
        F.col("doc_id").alias("new_doc_id"),
        F.col("shingles_h").alias("sh_a"),
        F.col("n_shingles").alias("n_a"),
    )
    b = corpus_shingles.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("shingles_h").alias("sh_b"),
        F.col("n_shingles").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(F.broadcast(a), "new_doc_id")
        .join(b, "corpus_doc_id")
        .withColumn("n_inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_doc_id", "corpus_doc_id", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash — near-dup fingerprints with hamming-block candidates
# --------------------------------------------------------------------------

def _simhash_udf():
    """Vectorized 64-bit SimHash over pre-hashed shingles: per bit b,
    vote = sum over shingles of (+1 if bit set else -1); fingerprint
    bit b = 1 iff vote > 0. Same pandas-UDF rationale as
    :func:`_minhash_sig_udf` — the 64 per-bit ``F.aggregate`` votes
    blow up the expression tree. The kernel is vectorized across the
    WHOLE Arrow batch: one shift-and-mask unpacks all 64 bits of every
    shingle hash in the chunk, per-row set-bit counts fall out of
    ``np.add.reduceat`` at the row offsets (vote > 0 ⟺ 2*count > m),
    and the fingerprint packs with a single matmul against 2^b — no
    per-row Python loop anywhere.
    """
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    pow2 = (np.uint64(1) << shifts)

    @pandas_udf("long")
    def _fp(hashes: pd.Series) -> pd.Series:
        flat, lens = _flat_segments(hashes)
        n = len(lens)
        fp = np.zeros(n, dtype=np.int64)
        if flat.size:
            u = flat.astype(np.uint64)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            for lo, hi in _row_chunks(offsets, n):
                seg = u[offsets[lo]:offsets[hi]]
                if seg.size == 0:
                    continue
                bits = ((seg[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                    np.int64
                )  # (m, 64)
                rows = np.flatnonzero(lens[lo:hi]) + lo
                starts = offsets[rows] - offsets[lo]
                counts = np.add.reduceat(bits, starts, axis=0)  # (rows, 64)
                pos = (2 * counts) > lens[rows][:, None]
                fp[rows] = (pos.astype(np.uint64) @ pow2).view(np.int64)
        return pd.Series(fp)

    return _fp


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with SimHash hamming distance <= 3.

    Candidates via the pigeonhole block trick: split the 64-bit
    fingerprint into 4 x 16-bit blocks; any pair within hamming 3
    shares at least one exact block → equi-join on (block_idx, block
    value), then verify with bit_count(xor). Fully oracle-checked
    (DEDUP_SIMHASH_SQL — md5-prefix hashes make the bit votes
    SQL-reproducible); behavior also pinned by tests/test_dedup.py.
    """
    # _doc_shingles already excludes <3-token docs, so every row has
    # >= 1 shingle; re-filtering on n_shingles would push size(<full
    # shingle expr>) below the projection and re-evaluate it per row.
    ds = _doc_shingles(spark, sf_dir)
    hashed = ds.withColumn("hashes", F.col("shingles_h"))
    fp = hashed.withColumn("simhash", _simhash_udf()(F.col("hashes")))
    blocks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(65535))
                        .alias("block_val"),
                    )
                    for i in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", "blk.block_idx", "blk.block_val")
    # Bucket-collect instead of self-join: a self-join reads the
    # fingerprint relation twice, and a tree-shaped plan recomputes the
    # whole shingle→hash→UDF pipeline per side. Grouping each block
    # bucket and generating pairs in-bucket evaluates the pipeline ONCE;
    # buckets are tiny by construction (16-bit blocks spread the corpus
    # ~uniformly), so the in-bucket pair expansion is trivially bounded.
    buckets = (
        blocks.groupBy("block_idx", "block_val")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("members"))
        .filter(
            (F.size("members") >= 2) & (F.size("members") <= LSH_BUCKET_CAP)
        )
        .select(F.array_sort("members").alias("members"))
    )
    pair_col = F.flatten(
        F.transform(
            F.col("members"),
            lambda x, i: F.transform(
                F.slice(F.col("members"), i + 2, F.size(F.col("members"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_col).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.simhash").alias("sim_a"),
            F.col("p.b.simhash").alias("sim_b"),
        )
        .distinct()  # a pair can share several blocks
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= 3)
    )
    return pairs.select("doc_a", "doc_b", "hamming")


# --------------------------------------------------------------------------
# Embedding-cosine near-dup (semantic dedup over the embedding column)
# --------------------------------------------------------------------------

EMB_DUP_THRESHOLD = 0.4


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, *, below_band: str = "refuse"
) -> DataFrame:
    """Semantic near-dup: document pairs whose embeddings (vec_id ==
    doc_id, FIXTURES.md) have cosine >= 0.4; keep_doc is the lower id.

    Candidates come from the similarity tier's tiled-GEMM kernel
    (``similarity._gemm_threshold_pairs`` — exact all-pairs with
    recall 1.0 up to GEMM_EXACT_MAX vectors; within multi-probed IVF
    lists above it, so compute stays ∝ Σ list² at 10⁹ vectors), then
    the shared
    order-stable fold-dot verify so the doubles match the DuckDB
    oracle bit-for-bit. The fixture threshold (0.4) sits at the noise
    floor where the hyperplane-block equi-join prunes ~nothing and
    pays a 2M-row per-pair fold verify (measured 4.2 s vs 0.8 s at
    sf0.1); at a production dedup threshold (>= 0.9 on clustered
    corpora) the blocked path (``_threshold_pairs_verified``) becomes
    the right plan again. The oracle below is the brute-force SQL, so
    the driver gate re-proves the equality at sf0.01.

    Above GEMM_EXACT_MAX this entry REFUSES (VERDICT r11 #2): 0.4 is
    below the IVF pair tier's measured competence band (recall 0.21
    in [0.4,0.5) at 800k vectors, STRESS_r11 `pair_threshold_curve`),
    so the registered query raises with the curve citation instead of
    silently dropping half the qualifying pairs. At-scale callers use
    ``similarity._gemm_threshold_pairs(..., below_band='exact')``
    (recall 1.0 — and measured cheaper than the IVF tier at
    noise-floor densities) or raise the threshold into the band.
    The same escape is threaded HERE as a keyword (VERDICT r12 #7) so
    a campaign composing this operator doesn't have to drop down a
    layer: the REGISTERED entry keeps the refusal default.
    """
    from .similarity import _gemm_threshold_pairs

    return _gemm_threshold_pairs(
        spark, sf_dir, EMB_DUP_THRESHOLD, below_band=below_band
    ).select(
        F.col("id_a").alias("keep_doc"),
        F.col("id_b").alias("dup_doc"),
        "cosine",
    )


DEDUP_EMBEDDING_COSINE_SQL = """
WITH v AS (
    SELECT vec_id, embedding,
           sqrt(list_reduce(
               list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                   i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
               (x, y) -> x + y)) AS norm
    FROM embeddings
)
SELECT a.vec_id AS keep_doc, b.vec_id AS dup_doc,
       round(list_reduce(
           list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
               i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
           (x, y) -> x + y) / (a.norm * b.norm), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_reduce(
          list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
              i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
          (x, y) -> x + y) / (a.norm * b.norm), 6) >= 0.4
"""


# --------------------------------------------------------------------------
# Passage-level duplication (substring dedup signal, RefinedWeb-style)
# --------------------------------------------------------------------------

PASSAGE_TOKENS = 32  # non-overlapping block size (tokens)


def dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-passage ratio: split every doc into
    NON-overlapping ``PASSAGE_TOKENS``-token blocks, hash each block,
    and count how many of a doc's blocks occur elsewhere in the corpus
    (the hash appears in >1 DISTINCT documents — a block repeated only
    WITHIN one document does not count, matching the cross-document
    RefinedWeb semantics; ADVICE r4). This is the passage/substring
    granularity between `dedup_exact` (whole doc) and shingle near-dup
    — the signal RefinedWeb/MassiveText use to strip copied passages
    from otherwise-unique pages.

    Scale shape: explode to blocks (~n_tokens/32 rows per doc), one
    map-side-combinable count per block hash, one equi-join back on
    the hash, one per-doc rollup — all word-count-shaped shuffles;
    nothing is ever quadratic in the corpus. Blocks are non-overlapping
    on purpose: overlapping windows (text_chunking's RAG shape) would
    self-collide on the shared stride and inflate the signal.
    """
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(PASSAGE_TOKENS)
    )
    blocks = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(starts).alias("start"),
    ).select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start"), PASSAGE_TOKENS), " ")
        ).alias("phash"),
    )
    counts = blocks.groupBy("phash").agg(
        F.countDistinct("doc_id").alias("cnt")
    )
    return (
        blocks.join(counts, "phash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_passages"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_passages") / F.col("n_passages"), 6),
        )
    )


DEDUP_PASSAGE_SQL = f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
), blocks AS (
    SELECT doc_id,
           md5(array_to_string(
               toks[start : least(start + {PASSAGE_TOKENS} - 1, n_tokens)],
               ' ')) AS phash
    FROM (SELECT doc_id, toks, n_tokens,
                 unnest(range(1, greatest(n_tokens, 1) + 1,
                              {PASSAGE_TOKENS})) AS start
          FROM base)
), counts AS (
    SELECT phash, count(DISTINCT doc_id) AS cnt FROM blocks GROUP BY 1
)
SELECT doc_id,
       count(*) AS n_passages,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_passages,
       round(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) / count(*), 6)
           AS dup_ratio
FROM blocks JOIN counts USING (phash)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Exact substring dedup (rolling windows — the suffix-array regime)
# --------------------------------------------------------------------------

SUBSTR_TOKENS = 16  # minimum duplicated-span length detected (tokens)
# Above this doc count the window hash switches from
# md5(array_join(window)) — byte-reproducible in DuckDB, so the fixture
# path stays oracle-hashable — to xxhash64 over the token-array slice:
# no per-window string concatenation, and the shuffle/groupBy key is an
# 8-byte long instead of a 32-char digest. Same gate discipline as
# GEMM_EXACT_MAX; identical semantics modulo 64-bit collisions.
#
# MEASURED at the 50k-doc stress scale (10×): exchange volume through
# the two corpus-token-sized shuffles is 150.1 MB (md5) vs 69.1 MB
# (xxhash64 AND rabin — both hash before the exchange, so the key is
# 8 bytes either way); warm wall time min-of-3 is 2.31 s (xxhash64)
# vs 3.60 s (rabin). The Rabin-Karp token-id kernel below — hash each
# token to a 64-bit id once, Horner the window hash over ids — was the
# planned 100-TB refinement, but its premise (exploded rows carrying K
# raw tokens into an exchange) does not hold: Catalyst computes the
# window hash inside the same codegen stage as the explode, so nothing
# token-shaped is ever shuffled, and the token-id kernel instead PAYS
# an Arrow export of the raw text to the Python workers. xxhash64
# therefore stays the above-gate default; 'rabin' remains selectable
# (it wins only when K is much larger — token bytes are hashed once,
# O(n), vs O(n·K) in the slice kernel — or when a tokenizer already
# emits int ids upstream). All three kernels are dup-marking-
# equivalence test-pinned.
SUBSTR_EXACT_MAX = 10_000

# Rabin-Karp base: odd multiplier (Python's own string-hash base) —
# arithmetic wraps mod 2^64 in uint64, the classic polynomial scheme.
_RK_BASE = 1_000_003


def _rk_window_hashes(k: int):
    """Arrow-batched window hasher: text → int64[ n−k+1 ] of Rabin-Karp
    window hashes (empty array when the doc has < k tokens). Token ids
    come from pandas' 64-bit siphash with its fixed default key, so
    every executor computes identical ids without shipping a
    vocabulary; the Horner accumulation is k vectorized uint64
    multiply-adds over the whole doc — O(n·k) C operations, no Python
    per-token loop, versus O(n·k) string bytes hashed twice in the
    md5 kernel."""

    @pandas_udf("array<long>")
    def _wh(text: pd.Series) -> pd.Series:
        base = np.uint64(_RK_BASE)
        out = []
        for doc in text:
            toks = doc.split(" ") if doc else []
            n = len(toks)
            if n < k:
                out.append([])
                continue
            ids = pd.util.hash_array(np.asarray(toks, dtype=object))
            m = n - k + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                h = h * base + ids[j : j + m]
            out.append(h.astype(np.int64))
        return pd.Series(out)

    return _wh


def _doc_windows(
    docs: DataFrame, kernel: str, k: int = SUBSTR_TOKENS
) -> DataFrame:
    """(doc_id, pos, whash) — one row per stride-1 K-token window of
    any (doc_id, text) frame, 1-based positions; docs with < K tokens
    emit one placeholder row with NULL pos/whash (explode_outer) so
    they stay visible downstream. Shared by the batch substring-dedup
    family and the streaming at-ingest screen (both sides MUST hash
    with the same kernel for the index probe to mean anything)."""
    toks = F.split(F.col("text"), " ")
    if kernel == "rabin":
        # token-id Rabin-Karp: one Arrow pass computes every window
        # hash for a doc; the explode emits (doc_id, pos, 8-byte long)
        # — no token arrays survive past the generator
        return docs.select(
            "doc_id",
            F.posexplode_outer(_rk_window_hashes(k)(F.col("text"))).alias(
                "pos0", "whash"
            ),
        ).select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "whash",
        )
    starts = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    sl = F.slice(F.col("toks"), F.col("pos"), k)
    wh = (
        F.xxhash64(sl)
        if kernel == "xxhash"
        else F.md5(F.array_join(sl, " "))
    )
    return docs.select(
        "doc_id",
        F.explode_outer(starts).alias("pos"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        "pos",
        F.when(F.col("pos").isNotNull(), wh).alias("whash"),
    )


def _substring_kernel(sf_dir: str) -> str:
    """The doc-count gate shared by every substring consumer."""
    from ..sources import table_row_count

    try:
        n_docs = table_row_count(sf_dir, "documents")
    except (ValueError, KeyError, OSError):
        n_docs = 0
    return "xxhash" if n_docs > SUBSTR_EXACT_MAX else "md5"


def _substring_marked(
    spark: SparkSession, sf_dir: str, force_kernel: str | None = None
) -> DataFrame:
    """Shared front half of the substring-dedup family: one row per
    stride-1 K-token window — (doc_id, pos, dup, real) where ``dup``
    marks a window whose hash occurs in >1 distinct documents and
    ``real`` distinguishes actual windows from the explode_outer
    placeholder that keeps sub-K docs visible downstream.
    ``force_kernel`` ('md5' | 'xxhash' | 'rabin') overrides the
    doc-count gate — the gate-equivalence test uses it."""
    kernel = force_kernel or _substring_kernel(sf_dir)
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    windows = _doc_windows(docs, kernel)
    counts = (
        windows.filter(F.col("whash").isNotNull())
        .groupBy("whash")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
    )
    return windows.join(counts, "whash", "left").select(
        "doc_id",
        "pos",
        (F.col("pos").isNotNull() & (F.coalesce(F.col("ndocs"), F.lit(0)) > 1)).alias(
            "dup"
        ),
        F.col("pos").isNotNull().alias("real"),
    )


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SUBSTRING-level duplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, how much of it is an exact ≥``SUBSTR_TOKENS``-token
    span that also appears verbatim in ANOTHER document, at ANY
    alignment. The reference technique builds a corpus suffix array;
    the Spark-first equivalent hashes every OVERLAPPING K-token window
    (stride 1), so a shared span of L ≥ K tokens shares exactly
    L−K+1 consecutive windows — runs of shared window positions
    therefore recover the MAXIMAL duplicated span exactly
    (``max_dup_span`` = longest run + K − 1), which aligned
    non-overlapping blocks (`dedup_passage`) cannot do.

    Per doc: ``n_windows``, ``n_dup_windows`` (window hash seen in >1
    DISTINCT documents — cross-document semantics, a span repeated only
    within one doc does not count), ``max_dup_span`` (tokens; 0 when
    clean), ``dup_ratio``. Docs shorter than K tokens have 0 windows
    and count as clean.

    Scale shape: stride-1 explode is ~n_tokens rows per doc — linear in
    corpus tokens, the same budget the suffix array pays; the hash
    count is one map-side-combinable groupBy, the join back is an
    equi-join on the hash, and the run detection is a per-doc window
    (pos − row_number grouping), partitioned by doc_id. Nothing is
    quadratic. At 100 TB the one refinement worth making is hashing
    tokens to 8-byte ints FIRST and rolling over those (Rabin-Karp)
    so the exploded rows carry 16×8 bytes instead of 16 raw tokens;
    md5-of-joined-tokens is kept here because the DuckDB oracle can
    compute it byte-identically.
    """
    marked = _substring_marked(spark, sf_dir)
    k = SUBSTR_TOKENS
    # consecutive dup positions collapse to one run id: pos - rank(pos)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        marked.filter(F.col("dup"))
        .withColumn("grp", F.col("pos") - F.row_number().over(wd))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg((F.max("run_len") + F.lit(k - 1)).alias("max_dup_span"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum(F.col("real").cast("long")).alias("n_windows"),
            F.sum(F.col("dup").cast("long")).alias("n_dup_windows"),
        )
        .join(runs, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.coalesce(F.col("max_dup_span"), F.lit(0)).cast("long").alias(
                "max_dup_span"
            ),
            F.when(F.col("n_windows") > 0,
                   F.round(F.col("n_dup_windows") / F.col("n_windows"), 6))
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
        )
    )


DEDUP_SUBSTRING_SQL = f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
), windows AS (
    SELECT doc_id, start AS pos,
           md5(array_to_string(
               toks[start : start + {SUBSTR_TOKENS} - 1], ' ')) AS whash
    FROM (SELECT doc_id, toks,
                 unnest(range(1, n_tokens - {SUBSTR_TOKENS} + 2)) AS start
          FROM base
          WHERE n_tokens >= {SUBSTR_TOKENS})
), counts AS (
    SELECT whash, count(DISTINCT doc_id) AS ndocs FROM windows GROUP BY 1
), marked AS (
    SELECT w.doc_id, w.pos, (c.ndocs > 1) AS dup
    FROM windows w JOIN counts c USING (whash)
), runs AS (
    SELECT doc_id,
           CAST(max(run_len) + {SUBSTR_TOKENS} - 1 AS BIGINT) AS max_dup_span
    FROM (
        SELECT doc_id, grp, count(*) AS run_len
        FROM (
            SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS grp
            FROM marked WHERE dup
        ) GROUP BY doc_id, grp
    ) GROUP BY doc_id
), per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows
    FROM marked GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(p.n_windows, 0) AS n_windows,
       COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
       COALESCE(r.max_dup_span, 0) AS max_dup_span,
       CASE WHEN COALESCE(p.n_windows, 0) > 0
            THEN round(p.n_dup_windows / p.n_windows, 6)
            ELSE 0.0 END AS dup_ratio
FROM base b
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN runs r USING (doc_id)
"""


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE form of `dedup_substring`: every maximal
    cross-document duplicated span as (doc_id, span_start, span_len) —
    1-based token offsets — which is what a Lee-et-al-style pipeline
    actually feeds the span-REMOVAL pass (they cut the duplicated
    bytes, not the documents). A maximal run of R consecutive shared
    window positions starting at pos p is the span [p, p+R+K−2]:
    span_len = R + K − 1. Same plan as the stats form up to the run
    grouping; the output is bounded by the number of duplicated spans,
    far below corpus-token count."""
    k = SUBSTR_TOKENS
    marked = _substring_marked(spark, sf_dir)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    return (
        marked.filter(F.col("dup"))
        .withColumn("grp", F.col("pos") - F.row_number().over(wd))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_len"),
        )
        .select("doc_id", "span_start", "span_len")
    )


_WINDOW_INDEX_CACHE: dict[tuple[str, str], DataFrame] = {}


def _corpus_window_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus side of the at-ingest substring screen: the DISTINCT
    window hashes of every corpus document — one column (whash),
    persisted once per campaign under the dedup-family cache seam
    (``release_shingles`` drops it). At 100 TB this is the window-hash
    twin of the MinHash band index: built once, bucketed on whash on
    disk, probed by each micro-batch's (small, broadcast) window set.
    Kernel follows the corpus-size gate so the index and any batch
    screened against it hash identically."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _WINDOW_INDEX_CACHE.get(key)
    if cached is not None:
        return cached
    kernel = _substring_kernel(sf_dir)
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    out = (
        _doc_windows(docs, kernel)
        .filter(F.col("whash").isNotNull())
        .select("whash")
        .distinct()
        .persist()
    )
    _WINDOW_INDEX_CACHE[key] = out
    return out


def substring_screen(
    new_docs: DataFrame,
    corpus_index: DataFrame,
    kernel: str,
    k: int = SUBSTR_TOKENS,
) -> DataFrame:
    """Screen a batch of incoming documents against a corpus
    window-hash index (:func:`_corpus_window_index`): every MAXIMAL
    span of ≥ K tokens that appears verbatim anywhere in the corpus,
    as (new_doc_id, span_start, span_len) — 1-based token offsets,
    the exact-span twin of :func:`near_dup_screen` and the RefinedWeb
    ingest gate's span-removal input (VERDICT r6 #6).

    Plan shape: the batch's windows are generated fresh (linear in
    batch tokens) and BROADCAST against the corpus index — an
    equi-join that probes the index without reshuffling it; runs of
    consecutive hit positions collapse to maximal spans in a per-doc
    window, partitioned by the (small) batch doc ids.
    """
    hits = (
        F.broadcast(
            _doc_windows(new_docs, kernel, k)
            .filter(F.col("whash").isNotNull())
            .select(F.col("doc_id").alias("new_doc_id"), "pos", "whash")
        )
        .join(corpus_index, "whash")
        .select("new_doc_id", "pos")
    )
    wd = Window.partitionBy("new_doc_id").orderBy("pos")
    return (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(wd))
        .groupBy("new_doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_len"),
        )
        .select("new_doc_id", "span_start", "span_len")
    )


DEDUP_SUBSTRING_SPANS_SQL = f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
), windows AS (
    SELECT doc_id, start AS pos,
           md5(array_to_string(
               toks[start : start + {SUBSTR_TOKENS} - 1], ' ')) AS whash
    FROM (SELECT doc_id, toks,
                 unnest(range(1, n_tokens - {SUBSTR_TOKENS} + 2)) AS start
          FROM base
          WHERE n_tokens >= {SUBSTR_TOKENS})
), counts AS (
    SELECT whash, count(DISTINCT doc_id) AS ndocs FROM windows GROUP BY 1
), marked AS (
    SELECT w.doc_id, w.pos
    FROM windows w JOIN counts c USING (whash)
    WHERE c.ndocs > 1
)
SELECT doc_id, min(pos) AS span_start,
       CAST(count(*) + {SUBSTR_TOKENS} - 1 AS BIGINT) AS span_len
FROM (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM marked
) GROUP BY doc_id, grp
"""


def dedup_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL pass Lee et al.'s pipeline feeds the spans into:
    rebuild every document with all duplicated-span tokens cut out
    (symmetric policy — every occurrence goes; the keep-one-canonical
    variant is a rank-1 filter on the span side). Emits (doc_id,
    n_tokens, n_removed, clean_text); clean_text is rebuilt by
    array_join on BOTH engines so the hash never depends on the
    source text's whitespace.

    Plan: the spans come from the linear-in-corpus-tokens span plan,
    collapse to one row per affected doc (collect_list bounded by
    spans-per-doc), LEFT-join back to documents on doc_id, and the cut
    is a row-local whole-stage-codegen HOF chain (transform → filter
    by NOT exists over the span list → transform → array_join) — no
    corpus-token shuffle is added on top of the span plan, and docs
    with no duplicated spans never leave the codegen stage."""
    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    spans = (
        dedup_substring_spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("long").alias("s"),
                    (F.col("span_start") + F.col("span_len") - 1)
                    .cast("long")
                    .alias("e"),
                )
            ).alias("spans")
        )
    )
    toks = F.split(F.col("text"), " ")
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), (i + 1).alias("p"))
    )
    span_list = F.coalesce(
        F.col("spans"),
        F.array().cast("array<struct<s:long,e:long>>"),
    )
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            span_list,
            lambda sp: (x["p"] >= sp["s"]) & (x["p"] <= sp["e"]),
        ),
    )
    return (
        docs.join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda x: x["t"]), " "
            ).alias("clean_text"),
        )
    )


DEDUP_SUBSTRING_SCRUB_SQL = f"""
WITH spans AS (
    {DEDUP_SUBSTRING_SPANS_SQL.replace(chr(10), chr(10) + '    ')}
), base AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), tokpos AS (
    SELECT doc_id, unnest(toks) AS tok,
           generate_subscripts(toks, 1) AS p
    FROM base
), kept AS (
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(t.tok, ' ' ORDER BY t.p) AS clean_text
    FROM tokpos t
    WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = t.doc_id
          AND t.p BETWEEN s.span_start
                      AND s.span_start + s.span_len - 1
    )
    GROUP BY t.doc_id
)
SELECT b.doc_id, b.n_tokens,
       b.n_tokens - coalesce(k.n_kept, 0) AS n_removed,
       coalesce(k.clean_text, '') AS clean_text
FROM base b LEFT JOIN kept k USING (doc_id)
"""


# --------------------------------------------------------------------------
# Asymmetric containment (quote / subset detection)
# --------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-CONTAINMENT pairs: C(A→B) = |shingles(A) ∩
    shingles(B)| / |shingles(A)| ≥ 0.8 — document A is mostly quoted
    by / embedded in B even when symmetric Jaccard is low (a long page
    wrapping a short one dilutes the union, which is exactly why
    quote/subset detection needs the asymmetric measure; Broder's
    containment, the RETSim/quote-dedup primitive). Emits BOTH
    directions when both clear the bar (mutual containment ≈ near-dup).

    Same candidate machinery as the Jaccard pipeline
    (:func:`_shingle_candidates`: df-capped shingle buckets → in-bucket
    pairs → distinct) with the same exact-verify step — each unordered
    candidate is verified ONCE against the full shingle arrays, then
    exploded into its two directions with the contained side's own
    denominator. The pair stage is bounded by SHINGLE_DF_CAP²/2 per
    shingle key (never Σ c(s)², never corpus²) and the shingle table is
    the same persisted campaign artifact.

    r15 exact-count fork (same gate + proof as :func:`_jaccard_pairs`):
    on corpora with no over-cap shingle the candidate co-occurrence
    count IS n_inter, so the array-verify join is skipped and both
    directions explode straight off the scored pair relation.
    """
    if not _corpus_has_overcap(spark, sf_dir):
        p = _scored_shingle_pairs(spark, sf_dir)
        both = p.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("doc_a"),
                        F.col("doc_b").alias("doc_b"),
                        F.col("cooc").cast("int").alias("n_inter"),
                        F.col("n_a").alias("n_a"),
                    ),
                    F.struct(
                        F.col("doc_b").alias("doc_a"),
                        F.col("doc_a").alias("doc_b"),
                        F.col("cooc").cast("int").alias("n_inter"),
                        F.col("n_b").alias("n_a"),
                    ),
                )
            ).alias("e")
        ).select("e.*")
        return (
            both.withColumn(
                "containment", F.round(F.col("n_inter") / F.col("n_a"), 6)
            )
            .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
            .select("doc_a", "doc_b", "n_inter", "n_a", "containment")
        )
    ds = _doc_shingles(spark, sf_dir)
    sa = ds.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles_h").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sb = ds.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles_h").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    und = _verify_joined(
        _shingle_candidates(spark, sf_dir), sa, sb,
        spark=spark, sf_dir=sf_dir, tag="shingle",
    ).withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
    both = und.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_a"),
                    F.col("doc_b").alias("doc_b"),
                    F.col("n_inter").alias("n_inter"),
                    F.col("na").alias("n_a"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b"),
                    F.col("n_inter").alias("n_inter"),
                    F.col("nb").alias("n_a"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    return (
        both.withColumn(
            "containment", F.round(F.col("n_inter") / F.col("n_a"), 6)
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", "n_inter", "n_a", "containment")
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH ds AS (
    SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
), exploded AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS shingle
    FROM (SELECT doc_id, unnest(shingles) AS s FROM ds)
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
    FROM exploded a JOIN exploded b USING (shingle)
    WHERE a.doc_id <> b.doc_id
    GROUP BY 1, 2
), counts AS (
    SELECT doc_id, len(shingles) AS n_shingles FROM ds
)
SELECT i.doc_a, i.doc_b, i.n_inter, c.n_shingles AS n_a,
       round(i.n_inter / CAST(c.n_shingles AS DOUBLE), 6) AS containment
FROM inter i JOIN counts c ON c.doc_id = i.doc_a
WHERE round(i.n_inter / CAST(c.n_shingles AS DOUBLE), 6)
      >= {CONTAINMENT_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Threshold-sweep planning view (how aggressive should the campaign be?)
# --------------------------------------------------------------------------

SWEEP_THRESHOLDS = [0.30, 0.35, 0.40, 0.45, 0.50, 0.60]


def dedup_threshold_sweep(
    spark: SparkSession, sf_dir: str, *, below_band: str = "refuse"
) -> DataFrame:
    """Campaign-planning sweep: for each candidate cosine threshold,
    how many embedding pairs qualify and how many documents the
    drop-the-higher-id rule would remove — the one-pass answer to "how
    aggressive should semantic dedup be?" before committing a 100 TB
    rewrite.

    ONE pair materialization at the loosest threshold (reusing the
    gated tiled-GEMM/IVF kernel of ``dedup_embedding_cosine``),
    consumed ONCE: a single groupBy(id_b) rolls the pair relation up
    to doc granularity carrying |T| conditional pair counts plus the
    doc's max cosine (map-side partial, so the shuffle is doc-sized,
    not pair-sized), a 1-row global agg sums the counts and buckets
    the maxima (drop-the-higher-id drops b at threshold t iff its max
    cosine >= t, so countDistinct collapses to a conditional count),
    and an array unpivot lays the row out on the threshold spine. The
    r9 form exploded pairs |T|-fold and ran |T| countDistinct
    expansions — at the 100x corpus that stage spilled 405 MB per
    task; this touches the pair relation exactly once, pre-combined.
    min(SWEEP_THRESHOLDS)=0.30 sits just above the fixtures' noise
    floor (~0.28; see sim_range_search), so the pair set stays far
    from n².

    Determinism: cosines are the shared round(·,6) fold doubles;
    threshold literals parse to identical IEEE doubles in both
    engines, so every ``>=`` decides identically.

    Above GEMM_EXACT_MAX the 0.30 pair materialization REFUSES with
    the recall-curve citation (similarity.PAIR_BAND_MIN) — a planning
    sweep whose counts are the deliverable must not be built on a
    tier measured at 0.21 recall in the [0.4,0.5) band; at-scale
    campaigns re-run it with below_band='exact' on a sampled corpus —
    threaded here as a keyword (VERDICT r12 #7) so the composed caller
    has the same escape hatch as the kernel; the REGISTERED entry
    keeps the refusal default.
    """
    from ..sources.tables import table_row_count
    from .similarity import _gemm_threshold_pairs

    n_vecs = table_row_count(sf_dir, "embeddings")
    thr = sorted(SWEEP_THRESHOLDS)
    pairs = _gemm_threshold_pairs(spark, sf_dir, min(thr),
                                  below_band=below_band)
    m = len(thr)
    doc_rollup = pairs.groupBy("id_b").agg(
        *[
            F.sum((F.col("cosine") >= F.lit(float(t))).cast("long")).alias(
                f"np_{i}"
            )
            for i, t in enumerate(thr)
        ],
        F.max("cosine").alias("max_cos"),
    )
    totals = doc_rollup.agg(
        *[F.sum(f"np_{i}").alias(f"np_{i}") for i in range(m)],
        *[
            F.sum((F.col("max_cos") >= F.lit(float(t))).cast("long")).alias(
                f"nd_{i}"
            )
            for i, t in enumerate(thr)
        ],
    )
    # unpivot the 1-row totals onto the threshold spine; a sweep point
    # where NOTHING qualifies must still report 0 dropped / all
    # surviving (the global agg's NULL sums on an empty pair relation),
    # so every count is coalesced — a missing row would read as a hole
    # in the planning curve, not as "dedup-free at this threshold"
    spine = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(t)).alias("threshold"),
                    F.col(f"np_{i}").alias("n_pairs"),
                    F.col(f"nd_{i}").alias("n_docs_dropped"),
                )
                for i, t in enumerate(thr)
            ]
        )
    ).alias("r")
    return totals.select(spine).select(
        F.col("r.threshold").alias("threshold"),
        F.coalesce("r.n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("r.n_docs_dropped", F.lit(0))
        .cast("long")
        .alias("n_docs_dropped"),
        (F.lit(n_vecs) - F.coalesce("r.n_docs_dropped", F.lit(0)))
        .cast("long")
        .alias("n_survivors"),
    )


DEDUP_THRESHOLD_SWEEP_SQL = f"""
WITH v AS (
    SELECT vec_id, embedding,
           sqrt(list_reduce(
               list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                   i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
               (x, y) -> x + y)) AS norm
    FROM embeddings
), pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_reduce(
               list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
               (x, y) -> x + y) / (a.norm * b.norm), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
), counts AS (
    SELECT t.threshold,
           count(*) AS n_pairs,
           count(DISTINCT p.id_b) AS n_docs_dropped
    FROM pairs p
    CROSS JOIN (SELECT unnest({SWEEP_THRESHOLDS}) AS threshold) t
    WHERE p.cosine >= t.threshold
    GROUP BY 1
)
SELECT s.threshold,
       CAST(coalesce(c.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(c.n_docs_dropped, 0) AS BIGINT) AS n_docs_dropped,
       CAST((SELECT count(*) FROM embeddings)
            - coalesce(c.n_docs_dropped, 0) AS BIGINT) AS n_survivors
FROM (SELECT unnest({SWEEP_THRESHOLDS}) AS threshold) s
LEFT JOIN counts c ON s.threshold = c.threshold
"""


# --------------------------------------------------------------------------
# SemDeDup — coarse cluster assign → within-cluster prune → keep-list
# --------------------------------------------------------------------------

# Within-cluster cosine at/above this ⇒ semantic duplicate. The fixture
# embeddings are near-orthogonal noise (within-cluster p99 ≈ 0.30,
# max ≈ 0.48 at sf0.01), so the production-style 0.9 would never fire;
# 0.35 exercises the prune at every fixture scale (14 pairs at
# sf0.001, 26 at sf0.01) while staying above the p99 noise floor.
SEMDEDUP_EPS = 0.35


_SEM_CACHE: dict[tuple, DataFrame] = {}  # (appId, sf_dir[, variant])


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SemDeDup pass (Abbas et al. 2023, arXiv:2303.09540) as
    ONE plan: coarse cluster assignment → within-cluster pairwise
    cosine → prune at SEMDEDUP_EPS → per-vector keep verdict
    (VERDICT r5 #4).

    Clustering here is the exact-integer LABEL-centroid assignment
    (the :func:`similarity.sim_centroid_assign` stage — deterministic
    and oracle-expressible, unlike sampled Lloyd). GATED like the rest
    of the embedding family (VERDICT r6 #4): above
    ``similarity.GEMM_EXACT_MAX`` vectors the registered entry routes
    through :func:`dedup_semantic_ivf` — coarse Lloyd lists, tile
    kernels within lists, work ∝ Σ list² — the composition a 100-TB
    campaign runs; below it the exact label-centroid plan is the
    oracle-hashable fixture path (same keep rule, test-pinned
    equivalence below the gate).

    Plan shape (exact path): one (label, pos) map-side aggregation
    builds K centroids (broadcast); assignment is a broadcast
    nested-loop + WindowGroupLimit argmax (corpus never shuffled); the
    prune is an equi-join on the cluster id whose per-cluster
    expansion is the Σ list² SemDeDup budget. The ``assigned``
    relation appears on both sides of the prune join plus the output,
    so it is PERSISTED behind the dedup-family cache seam
    (``release_shingles`` releases it) — previously re-derived as 6
    column-pruned scans per run; now one corpus pass per campaign.
    """
    from ..sources import table_row_count
    from . import similarity as _S

    try:
        n_vecs = table_row_count(sf_dir, "embeddings")
    except (ValueError, KeyError, OSError):
        n_vecs = 0
    if n_vecs > _S.GEMM_EXACT_MAX:
        return dedup_semantic_ivf(spark, sf_dir)
    assigned = _semantic_assigned(spark, sf_dir)
    return _semantic_keep_verdicts(assigned)


def _semantic_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cl, cos_c, arr, nrm): each vector's exact-integer
    label-centroid assignment + priority key — persisted once per
    (app, sf_dir) under the dedup-family cache discipline."""
    from .similarity import _dot

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SEM_CACHE.get(key)
    if cached is not None:
        return cached
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vd = emb.select("vec_id", F.col("label").alias("lbl"), arr.alias("arr"))
    micro = F.transform(F.col("arr"), lambda x: F.round(x * 1e6).cast("long"))
    comp = (
        vd.select("lbl", F.posexplode(micro).alias("pos", "mv"))
        .groupBy(F.col("lbl").alias("cl"), "pos")
        .agg(F.sum("mv").alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    cent = comp.groupBy("cl").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        (F.col("s") / (F.col("cnt") * 1000000.0)).alias("v"),
                    )
                )
            ),
            lambda st: st["v"],
        ).alias("cvec")
    )
    scored = vd.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "arr",
        "cl",
        F.round(
            _dot(F.col("arr"), F.col("cvec"))
            / (
                F.sqrt(_dot(F.col("arr"), F.col("arr")))
                * F.sqrt(_dot(F.col("cvec"), F.col("cvec")))
            ),
            6,
        ).alias("cos_c"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cl"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "cl",
            "cos_c",
            "arr",
            F.sqrt(_dot(F.col("arr"), F.col("arr"))).alias("nrm"),
        )
        .persist()
    )
    _SEM_CACHE[key] = assigned
    return assigned


def _semantic_keep_verdicts(assigned: DataFrame) -> DataFrame:
    """Within-cluster eps-prune over an assignment relation — the
    SemDeDup keep rule as one equi-join on the cluster id."""
    from .similarity import _dot

    u = assigned.select(
        F.col("cl").alias("p_cl"),
        F.col("vec_id").alias("u_id"),
        F.col("cos_c").alias("u_cos"),
        F.col("arr").alias("u_arr"),
        F.col("nrm").alias("u_nrm"),
    )
    v = assigned.select(
        F.col("cl").alias("p_cl"),
        F.col("vec_id").alias("v_id"),
        F.col("cos_c").alias("v_cos"),
        F.col("arr").alias("v_arr"),
        F.col("nrm").alias("v_nrm"),
    )
    earlier = (F.col("u_cos") < F.col("v_cos")) | (
        (F.col("u_cos") == F.col("v_cos"))
        & (F.col("u_id") < F.col("v_id"))
    )
    dup = F.round(
        _dot(F.col("u_arr"), F.col("v_arr"))
        / (F.col("u_nrm") * F.col("v_nrm")),
        6,
    ) >= SEMDEDUP_EPS
    dropped = (
        u.join(v, "p_cl").filter(earlier & dup)
        .select(F.col("v_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cl").alias("cluster"),
            "cos_c",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def _ivf_priority_udf(centers: "np.ndarray"):
    """Arrow-vectorized (nearest coarse centroid, cosine-to-it) struct —
    the SemDeDup priority key over IVF clusters. Stable argmax (first
    max wins) + round(·,6) keep it deterministic for a fixed centroid
    set."""
    C = centers / np.linalg.norm(centers, axis=1, keepdims=True)

    @pandas_udf("cl long, cos_c double")
    def _f(embs: pd.Series) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in embs.to_numpy()])
        n = np.linalg.norm(X, axis=1, keepdims=True)
        X = X / np.where(n == 0, 1.0, n)
        S = X @ C.T
        cl = S.argmax(axis=1)
        return pd.DataFrame(
            {
                "cl": cl.astype(np.int64),
                "cos_c": np.round(S[np.arange(len(cl)), cl], 6),
            }
        )

    return _f


def _semdedup_list_verdicts(eps: float, chunk: int = 1024):
    """Per-cluster SemDeDup keep verdicts as ONE Arrow kernel: sort
    the list by priority (cos-to-centroid, vec_id), unit-normalize,
    and mark a row dropped iff ANY earlier row is within eps —
    blockwise GEMM against the earlier prefix, so peak memory is
    chunk x list_size doubles, never list². The verdict needs no pair
    relation, no distinct and no joins — the paper's rule is a
    per-cluster predicate, not a pair dataset."""

    def _f(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((pdf["vec_id"].to_numpy(),
                            pdf["cos_c"].to_numpy()))
        pdf = pdf.iloc[order].reset_index(drop=True)
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["emb"].to_numpy()])
        n = np.linalg.norm(X, axis=1, keepdims=True)
        X = X / np.where(n == 0, 1.0, n)
        m = len(pdf)
        dropped = np.zeros(m, dtype=bool)
        for lo in range(1, m, chunk):
            hi = min(lo + chunk, m)
            # rows lo..hi vs ALL earlier rows 0..hi (triangle masked):
            # a row is dropped on ANY earlier eps-neighbor, dropped or
            # not — the SemDeDup rule is pairwise, not transitive
            S = np.round(X[lo:hi] @ X[:hi].T, 6)
            idx = np.arange(lo, hi)
            tri = np.arange(hi)[None, :] < idx[:, None]
            dropped[lo:hi] = ((S >= eps) & tri).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cl"],
                "cos_c": pdf["cos_c"],
                "kept": ~dropped,
            }
        )

    return _f


def dedup_semantic_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup in the IVF regime — the composition a 100-TB curation
    run actually executes (VERDICT r5 #4): coarse Lloyd centroids (the
    ``mlops`` faiss-style bounded-sample training), priority = cosine
    to the nearest coarse centroid ascending (keep low-centroid-
    similarity examples, the paper's rule), within-cluster eps-prune.

    Below GEMM_EXACT_MAX the candidate set is the exact all-pairs
    kernel, so the keep-list equals the brute-force GLOBAL rule
    verbatim — pinned in tests/test_dedup.py. ABOVE the gate (r11,
    the 800k census finding) the verdicts come from ONE per-cluster
    Arrow kernel (:func:`_semdedup_list_verdicts`): the corpus
    shuffles ONCE by cluster id and each list resolves its keeps in
    blockwise GEMM — no pair relation ever materializes. The previous
    above-gate form routed the multi-probed eps-PAIR dataset through
    joins + distinct; at 800k vectors and eps 0.35 (below the stress
    corpus's similarity noise floor) that is hundreds of millions of
    pairs, and the spill filled an 80 GB disk before the plan
    finished. The kernel form completes the same corpus in 44.7 s at
    the default 8 GiB heap with Σ cluster²/n² = 0.00109 and a clean
    top-4-cluster distribution-integrity check (STRESS_r12
    `semdedup_800k`); fixture-scale semantics vs the brute-force
    within-cluster rule are pinned by the forced-gate test in
    tests/test_dedup.py. Within-cluster pruning is
    also the paper's actual semantics — SemDeDup computes pairwise
    similarity INSIDE k-means clusters, never across them.

    Rows-only by nature (driver-side Lloyd is not SQL-expressible —
    same structural reason as ``sim_ann_ivf``).
    """
    from ..sources.tables import table_row_count
    from .similarity import (
        GEMM_EXACT_MAX,
        _gemm_threshold_pairs,
        _pair_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    n = table_row_count(sf_dir, "embeddings")
    centers = _pair_centroids(emb, n)
    if n > GEMM_EXACT_MAX:
        return (
            emb.select(
                "vec_id",
                "embedding",
                _ivf_priority_udf(centers)(F.col("embedding")).alias("a"),
            )
            .select(
                "vec_id",
                F.col("a.cl").alias("cl"),
                F.col("a.cos_c").alias("cos_c"),
                F.col("embedding").alias("emb"),
            )
            .groupBy("cl")
            .applyInPandas(
                lambda pdf: _semdedup_list_verdicts(SEMDEDUP_EPS)(pdf),
                "vec_id long, cluster long, cos_c double, kept boolean",
            )
        )
    # Fixture path: the (vec_id, cl, cos_c) priority relation is
    # consumed THREE times (prune-join a-side, b-side, and the output
    # spine), and each consumer re-ran the corpus priority kernel —
    # three ArrowEvalPython evals of the same pass in the r13 plan.
    # Persist it once behind the semantic cache seam (released by
    # release_semantic, the _semantic_assigned discipline); the frame
    # is gate-bounded (<= GEMM_EXACT_MAX rows x 24 B).
    key = (spark.sparkContext.applicationId, sf_dir, "ivf_priority")
    assigned = _SEM_CACHE.get(key)
    if assigned is None:
        assigned = (
            emb.select(
                "vec_id",
                _ivf_priority_udf(centers)(F.col("embedding")).alias("a"),
            )
            .select(
                "vec_id",
                F.col("a.cl").alias("cl"),
                F.col("a.cos_c").alias("cos_c"),
            )
            .persist()
        )
        _SEM_CACHE[key] = assigned
    pairs = _gemm_threshold_pairs(spark, sf_dir, SEMDEDUP_EPS).select(
        "id_a", "id_b"
    )
    pa_ = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("cos_c").alias("a_cos"),
    )
    pb_ = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("cos_c").alias("b_cos"),
    )
    b_later = (F.col("a_cos") < F.col("b_cos")) | (
        (F.col("a_cos") == F.col("b_cos")) & (F.col("id_a") < F.col("id_b"))
    )
    dropped = (
        pairs.join(pa_, "id_a")
        .join(pb_, "id_b")
        .select(
            F.when(b_later, F.col("id_b")).otherwise(F.col("id_a")).alias(
                "vec_id"
            )
        )
        .distinct()
    )
    return (
        assigned.join(
            dropped.withColumn("_drop", F.lit(True)), "vec_id", "left"
        )
        .select(
            "vec_id",
            F.col("cl").alias("cluster"),
            "cos_c",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


DEDUP_SEMANTIC_SQL = f"""
WITH vd AS (
    SELECT vec_id, label AS lbl,
           list_transform(embedding, x -> x::DOUBLE) AS arr
    FROM embeddings
), comp AS (
    SELECT lbl AS cl, t.i AS pos,
           CAST(sum(CAST(round(arr[t.i] * 1e6, 0) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS cnt
    FROM vd, unnest(range(1, 65)) AS t(i)
    GROUP BY 1, 2
), cent AS (
    SELECT cl, list(s / (cnt * 1000000.0) ORDER BY pos) AS cvec
    FROM comp GROUP BY 1
), scored AS (
    SELECT v.vec_id, v.arr, c.cl,
           round(list_reduce(
                     list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                         i -> v.arr[i] * c.cvec[i])),
                     (x, y) -> x + y)
                 / (sqrt(list_reduce(
                        list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                            i -> v.arr[i] * v.arr[i])),
                        (x, y) -> x + y))
                    * sqrt(list_reduce(
                        list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                            i -> c.cvec[i] * c.cvec[i])),
                        (x, y) -> x + y))),
                 6) AS cos_c
    FROM vd v CROSS JOIN cent c
), assigned AS (
    SELECT vec_id, arr, cl, cos_c,
           sqrt(list_reduce(
               list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                   i -> arr[i] * arr[i])),
               (x, y) -> x + y)) AS nrm
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cos_c DESC, cl) AS rn
          FROM scored)
    WHERE rn = 1
), dropped AS (
    SELECT DISTINCT v.vec_id
    FROM assigned u JOIN assigned v ON u.cl = v.cl
    WHERE (u.cos_c < v.cos_c
           OR (u.cos_c = v.cos_c AND u.vec_id < v.vec_id))
      AND round(list_reduce(
                    list_prepend(0.0::DOUBLE, list_transform(range(1, 65),
                        i -> u.arr[i] * v.arr[i])),
                    (x, y) -> x + y) / (u.nrm * v.nrm), 6) >= {SEMDEDUP_EPS}
)
SELECT a.vec_id, a.cl AS cluster, a.cos_c,
       d.vec_id IS NULL AS kept
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


QUERIES = {
    "dedup_threshold_sweep": dedup_threshold_sweep,
    "dedup_semantic": dedup_semantic,
    # rows-only by nature (driver-side Lloyd): the IVF-regime SemDeDup;
    # below the GEMM gate its keep-list equals the brute-force global
    # rule (test-pinned), above it work ∝ Σ list² (stress-measured)
    "dedup_semantic_ivf": dedup_semantic_ivf,
    "dedup_containment": dedup_containment,
    "dedup_passage": dedup_passage,
    "dedup_substring": dedup_substring,
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_substring_scrub": dedup_substring_scrub,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_components": dedup_components,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

# DuckDB twins of the signature pipelines. Possible because the shingle
# hash is an md5 prefix (byte-standardized, identical in both engines);
# the permutation constants inline as literals. CTEs are MATERIALIZED so
# the signature computation runs once, not per join reference (see the
# measured note at similarity.py::SIM_KNN_GRAPH_SQL).

_MH_ROWS_PER_BAND = MINHASH_K // MINHASH_BANDS
_MH_HASHED_SQL = (
    "list_transform(shingles, s -> "
    + _SHINGLE_HASH64_SQL.format(s="s")
    + f" % {MINHASH_PRIME})"
)
_MH_SIG_SQL = "[" + ",\n        ".join(
    f"list_min(list_transform(hv, h -> ({2 * k + 1} * h"
    f" + {(k * 2654435761) % MINHASH_PRIME}) % {MINHASH_PRIME}))"
    for k in range(MINHASH_K)
) + "]"

DEDUP_MINHASH_LSH_SQL = f"""
WITH sh AS MATERIALIZED (
    SELECT doc_id, {_SHINGLES_SQL} AS shingles
    FROM documents WHERE len(string_split(text, ' ')) >= 3
), hashed AS (
    SELECT doc_id, shingles, {_MH_HASHED_SQL} AS hv FROM sh
), sigs AS MATERIALIZED (
    SELECT doc_id, {_MH_SIG_SQL} AS sig FROM hashed
), banded AS MATERIALIZED (
    SELECT doc_id, t.i - 1 AS band_idx,
           array_to_string(list_transform(
               sig[(t.i - 1) * {_MH_ROWS_PER_BAND} + 1 : t.i * {_MH_ROWS_PER_BAND}],
               x -> CAST(x AS VARCHAR)), '_') AS band_sig
    FROM sigs, unnest(range(1, {MINHASH_BANDS} + 1)) AS t(i)
), bucket_sizes AS (
    SELECT band_idx, band_sig, count(*) AS n
    FROM banded GROUP BY 1, 2
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id
    JOIN bucket_sizes s ON s.band_idx = a.band_idx AND s.band_sig = a.band_sig
    WHERE s.n BETWEEN 2 AND {LSH_BUCKET_CAP}
)
SELECT doc_a, doc_b,
       round(len(list_intersect(x.shingles, y.shingles))
             / (len(x.shingles) + len(y.shingles)
                - len(list_intersect(x.shingles, y.shingles))), 6) AS jaccard
FROM cand
JOIN sh x ON x.doc_id = doc_a
JOIN sh y ON y.doc_id = doc_b
WHERE round(len(list_intersect(x.shingles, y.shingles))
            / (len(x.shingles) + len(y.shingles)
               - len(list_intersect(x.shingles, y.shingles))), 6)
      >= {JACCARD_THRESHOLD}
"""

# simhash bit votes: the md5-prefix hash is 60-bit, so fingerprint bits
# 60-63 are provably zero — only bits 0..59 need terms (a 1<<63 literal
# would not even fit BIGINT).
_SIMHASH_FP_SQL = "(" + "\n + ".join(
    f"CASE WHEN 2 * len(list_filter(hv, h -> (h >> {b}) & 1 = 1)) > m"
    f" THEN {1 << b} ELSE 0 END"
    for b in range(60)
) + ")"

DEDUP_SIMHASH_SQL = f"""
WITH sh AS (
    SELECT doc_id, {_SHINGLES_SQL} AS shingles
    FROM documents WHERE len(string_split(text, ' ')) >= 3
), hashed AS (
    SELECT doc_id,
           list_transform(shingles, s -> {_SHINGLE_HASH64_SQL.format(s="s")})
               AS hv,
           len(shingles) AS m
    FROM sh
), fp AS MATERIALIZED (
    SELECT doc_id, {_SIMHASH_FP_SQL} AS simhash FROM hashed
), blocks AS MATERIALIZED (
    SELECT doc_id, simhash, t.i - 1 AS block_idx,
           (simhash >> ((t.i - 1) * 16)) & 65535 AS block_val
    FROM fp, unnest(range(1, {SIMHASH_BLOCKS} + 1)) AS t(i)
), bucket_sizes AS (
    SELECT block_idx, block_val, count(*) AS n
    FROM blocks GROUP BY 1, 2
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS sim_a, b.simhash AS sim_b
    FROM blocks a
    JOIN blocks b ON a.block_idx = b.block_idx AND a.block_val = b.block_val
                 AND a.doc_id < b.doc_id
    JOIN bucket_sizes s ON s.block_idx = a.block_idx AND s.block_val = a.block_val
    WHERE s.n BETWEEN 2 AND {LSH_BUCKET_CAP}
)
SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM pairs
WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""


ORACLES = {
    "dedup_semantic": DEDUP_SEMANTIC_SQL,
    "dedup_threshold_sweep": DEDUP_THRESHOLD_SWEEP_SQL,
    "dedup_containment": DEDUP_CONTAINMENT_SQL,
    "dedup_passage": DEDUP_PASSAGE_SQL,
    "dedup_substring": DEDUP_SUBSTRING_SQL,
    "dedup_substring_spans": DEDUP_SUBSTRING_SPANS_SQL,
    "dedup_substring_scrub": DEDUP_SUBSTRING_SCRUB_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    "dedup_components": DEDUP_COMPONENTS_SQL,
    "dedup_embedding_cosine": DEDUP_EMBEDDING_COSINE_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_LSH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    # dedup_minhash_ml stays rows-only: MLlib's MinHashLSH uses its own
    # internal hash family (not reproducible in SQL by design).
}
