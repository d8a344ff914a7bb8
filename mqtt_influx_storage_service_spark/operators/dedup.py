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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

JACCARD_THRESHOLD = 0.5
MINHASH_K = 64          # signature length
MINHASH_BANDS = 16      # 16 bands x 4 rows: P(candidate | j=0.5) ≈ 0.64
MINHASH_PRIME = 2147483647  # 2^31 - 1, Mersenne
SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4      # pigeonhole: hamming <= 3 guarantees a shared block


def _shingles(text_col: str = "text") -> F.Column:
    """Distinct word 3-shingles of a text column (built-ins only).

    Guarded for <3 tokens: Spark's sequence(1, 0) counts DOWN instead
    of producing an empty array, so short docs get an explicit empty.
    """
    toks = F.split(F.col(text_col), " ")
    return F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


_SHINGLES_SQL = """
    list_distinct(list_transform(
        range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
        i -> string_split(text, ' ')[i] || ' ' ||
             string_split(text, ' ')[i+1] || ' ' ||
             string_split(text, ' ')[i+2]))
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _shingles().alias("shingles")).withColumn(
        "n_shingles", F.size("shingles")
    )


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

    Plan: explode distinct shingles → self-equi-join on shingle with
    doc_a < doc_b → count shared shingles per pair → join per-doc
    shingle counts → Jaccard = inter / (|A| + |B| - inter). Never
    forms the cross product; the shingle index is the blocking key.
    """
    ds = _doc_shingles(spark, sf_dir)
    exploded = ds.select("doc_id", F.explode("shingles").alias("shingle"))
    a = exploded.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = exploded.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    counts = ds.select("doc_id", "n_shingles")
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = (
        inter.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
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
    SELECT doc_id, unnest(shingles) AS shingle FROM ds
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
# MinHash + LSH (banded) — candidate generation at scale
# --------------------------------------------------------------------------

def _min_for_perm(k: int):
    """Fold producing min_k over pre-hashed shingles for permutation k:
    h_k(x) = ((2k+1)*x + k*golden) mod p. Odd multipliers keep the
    family well-spread; operands stay < 2^63 so ANSI mode never
    overflows. Closure factory keeps the merge lambda 2-positional."""
    a, b = 2 * k + 1, (k * 2654435761) % MINHASH_PRIME
    return lambda acc, x: F.least(acc, F.pmod(a * x + b, F.lit(MINHASH_PRIME)))


def _with_minhash_signature(ds: DataFrame) -> DataFrame:
    """Add a 64-slot minhash signature column.

    The xxhash64 base hashes are materialized ONCE into a column and
    the 64 permutation-mins each fold over that column reference —
    inlining the hash transform into every aggregate (the naive
    formulation) blows the expression tree up 64x and dominated
    runtime before this split.
    """
    hashed = ds.withColumn(
        "hashed",
        F.transform(
            F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME))
        ),
    )
    sig = F.array(
        *[
            F.aggregate(
                F.col("hashed"), F.lit(MINHASH_PRIME).cast("long"), _min_for_perm(k)
            )
            for k in range(MINHASH_K)
        ]
    )
    return hashed.withColumn("sig", sig).drop("hashed")


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding, verified with exact
    Jaccard (no oracle: xxhash64 has no DuckDB twin; pinned instead by
    tests/test_dedup.py recall-vs-exact assertions).

    Pipeline: signature (projection) → explode 16 band keys →
    equi-join on (band_idx, band_signature) → distinct candidate pairs
    → exact-Jaccard verify join. This is the 100 TB path: candidates
    scale with collision count, not corpus².
    """
    ds = _doc_shingles(spark, sf_dir).filter(F.col("n_shingles") > 0)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    sigs = _with_minhash_signature(ds)
    banded = sigs.select(
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
    la = banded.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_sig")
    lb = banded.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_sig")
    candidates = (
        la.join(lb, ["band_idx", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verification of candidates only
    sh = _doc_shingles(spark, sf_dir)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"),
                   F.col("n_shingles").alias("n_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"),
                   F.col("n_shingles").alias("n_b"))
    verified = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# SimHash — near-dup fingerprints with hamming-block candidates
# --------------------------------------------------------------------------

def _simhash() -> F.Column:
    """64-bit SimHash of the shingle set: sum(sign of bit b of
    xxhash64(shingle)) over shingles, per bit; fingerprint bit b = 1 if
    the sum is positive.

    The per-bit loop is a Python loop over literal shift amounts
    (shiftright requires an int, not a Column); the shingle hashes are
    computed once and shared across the 64 bit-vote aggregates.
    """
    hashes = F.transform(F.col("shingles"), lambda s: F.xxhash64(s))

    def _vote(bit: int):
        # closure factory: PySpark reads lambda arity, so the merge
        # lambda must stay exactly 2-positional (no bit=... default)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(hashes, F.lit(0), _vote(b))
        fp = fp.bitwiseOR(
            F.when(vote > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return fp


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with SimHash hamming distance <= 3.

    Candidates via the pigeonhole block trick: split the 64-bit
    fingerprint into 4 x 16-bit blocks; any pair within hamming 3
    shares at least one exact block → equi-join on (block_idx, block
    value), then verify with bit_count(xor). No oracle (hash-dependent);
    pinned by tests/test_dedup.py.
    """
    ds = _doc_shingles(spark, sf_dir).filter(F.col("n_shingles") > 0)
    fp = ds.withColumn("simhash", _simhash())
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
    ba = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "block_idx", "block_val",
    )
    bb = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "block_idx", "block_val",
    )
    pairs = (
        ba.join(bb, ["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= 3)
    )
    return pairs.select("doc_a", "doc_b", "hamming").orderBy("doc_a", "doc_b")


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    # dedup_minhash_lsh / dedup_simhash: hash-function-dependent, not
    # SQL-expressible in DuckDB — rows-only driver check; recall vs the
    # exact-Jaccard oracle is asserted in tests/test_dedup.py.
}
