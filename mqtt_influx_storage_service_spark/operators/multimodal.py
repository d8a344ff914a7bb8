"""Multimodal columns (Tier C, driver mandate): image/audio/video as
opaque ``binary`` payloads + typed metadata in one table, with the
decode / feature-extract stage as Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic stub (``_decode_stub``) — the Spark-side
plumbing (schema, binary handling, batch iteration, partition
locality) is real and tested (tests/test_multimodal.py).

Scale notes: binary payloads ride in parquet as BYTE_ARRAY with the
metadata columns beside them; at 100 TB the manifest queries
(counts/sizes per modality) never deserialize payload bytes thanks to
parquet column pruning — verify with .explain ReadSchema. Feature
extraction is mapInPandas over batches, which is exactly how a real
decoder (PIL/ffmpeg) would be mounted; partitioning by (modality,
size-band) keeps decoder batches homogeneous.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

MODALITIES = ["image", "audio", "video"]


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> multimodal table: payload bytes (utf-8 of text —
    stand-in for media bytes) + modality + typed metadata derived
    deterministically from doc stats."""
    docs = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("n_chars") % 1920 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 1080 + 16).cast("int").alias("height"),
        F.round(F.col("n_chars") / 37.0, 6).alias("duration_s"),
        F.col("source"),
    )


# --------------------------------------------------------------------------
# Manifest rollup — metadata-only scan (payload column pruned)
# --------------------------------------------------------------------------

def mm_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = build_media_table(spark, sf_dir)
    return media.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
        F.round(F.sum("duration_s"), 6).alias("total_duration_s"),
    )


MM_MANIFEST_SQL = """
WITH media AS (
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           encode(text) AS payload,
           CAST(n_chars % 1920 + 16 AS INT) AS width,
           CAST(n_chars % 1080 + 16 AS INT) AS height,
           round(n_chars / 37.0, 6) AS duration_s
    FROM documents
)
SELECT modality, count(*) AS n_assets,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       min(width) AS min_width,
       max(height) AS max_height,
       round(sum(duration_s), 6) AS total_duration_s
FROM media GROUP BY modality
"""


# --------------------------------------------------------------------------
# Feature extraction — the decode seam (stubbed codec, real plumbing)
# --------------------------------------------------------------------------

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, "
    "first_byte int, checksum long, aspect_ratio double"
)


def _decode_stub(payload: bytes, modality: str) -> dict:
    """STUB decoder. A real deployment replaces this with PIL /
    torchaudio / ffmpeg frame sampling; the container ships no codecs
    (environment constraint), so features are deterministic byte-level
    stand-ins. The function signature (bytes, modality) -> features is
    the contract a real codec drops into.
    """
    checksum = 0
    for by in payload:
        checksum = (checksum * 131 + by) % 1000000007
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum": checksum,
    }


def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the media table — Arrow
    batches in, feature frame out; the per-batch loop is where a
    vectorized decoder would run."""
    media = build_media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "aspect_ratio": (pdf["width"] / pdf["height"]).round(6),
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


QUERIES = {
    "mm_manifest": mm_manifest,
    "mm_extract_features": mm_extract_features,
}

ORACLES = {
    "mm_manifest": MM_MANIFEST_SQL,
    # mm_extract_features: the decode stage is a stubbed codec behind
    # mapInPandas — rows-only driver check; determinism pinned in
    # tests/test_multimodal.py.
}
