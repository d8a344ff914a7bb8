"""MLlib-backed variants of the near-dup / ANN operators (SURVEY.md §2
Tier C: "MinHash-LSH (pyspark.ml.feature.MinHashLSH)",
"LSH (BucketedRandomProjectionLSH) at scale").

The hand-rolled versions in dedup.py / similarity.py expose the
mechanics (band hashing, hyperplane buckets) and are the ones tuned
for this corpus; these MLlib twins demonstrate the standard-library
path a production deployment would start from — fit() learns nothing
data-dependent for these hash families, so the "model" is just a
seeded hash parameterization and the transform stays fully
distributed. Approximate by construction → rows-only driver check,
recall pinned against the exact baselines in tests/test_mlops.py.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup import JACCARD_THRESHOLD, _doc_shingles
from .similarity import N_QUERIES, TOPK

SEED_TF = 1 << 18      # hashing-TF feature space for shingle sets
ML_HASH_TABLES = 8


def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup: shingles → binary HashingTF vectors →
    approxSimilarityJoin at Jaccard distance <= 0.5.

    distCol is MinHash's ESTIMATE of Jaccard distance over the hashed
    feature space, so we report the exact shingle Jaccard for verified
    pairs (same verify join as dedup_minhash_lsh) — LSH proposes,
    exact disposes.
    """
    ds = _doc_shingles(spark, sf_dir)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=SEED_TF, binary=True
    )
    feats = tf.transform(ds)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=ML_HASH_TABLES,
        seed=42,
    )
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - JACCARD_THRESHOLD, distCol="est_dist"
    )
    pairs = (
        joined.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("datasetA.shingles").alias("sh_a"),
            F.col("datasetB.shingles").alias("sh_b"),
            F.col("datasetA.n_shingles").alias("n_a"),
            F.col("datasetB.n_shingles").alias("n_b"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return pairs.select("doc_a", "doc_b", "jaccard")


def sim_ann_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH ANN top-k: L2-normalize embeddings
    (euclidean distance on the unit sphere orders identically to
    cosine), bucket by random projections, approxSimilarityJoin within
    a distance radius, exact re-rank to top-5 per query.

    The radius bounds candidate generation (distance 1.2 on the unit
    sphere = cosine ~0.28); recall vs the brute-force baseline is
    pinned in tests/test_mlops.py.
    """
    emb = load_table(spark, sf_dir, "embeddings", rebalance=True)
    vecd = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("arr"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("arr"), lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    unit = vecd.select(
        "vec_id",
        array_to_vector(
            F.transform(F.col("arr"), lambda x: x / norm)
        ).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=6,
        bucketLength=0.5, seed=42,
    )
    model = brp.fit(unit)
    q = unit.filter(F.col("vec_id") < N_QUERIES)
    joined = model.approxSimilarityJoin(q, unit, 1.2, distCol="dist")
    scored = joined.select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        # cosine = 1 - d^2/2 for unit vectors
        F.round(1 - F.col("dist") * F.col("dist") / 2, 6).alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


QUERIES = {
    "dedup_minhash_ml": dedup_minhash_ml,
    "sim_ann_brp": sim_ann_brp,
}

# Both approximate-by-construction (hash-family dependent): rows-only
# driver check; recall vs the exact baselines in tests/test_mlops.py.
ORACLES: dict[str, str] = {}
