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


def build_media_table(
    spark: SparkSession, sf_dir: str, rebalance: bool = False
) -> DataFrame:
    """documents -> multimodal table: payload bytes (utf-8 of text —
    stand-in for media bytes) + modality + typed metadata derived
    deterministically from doc stats.

    ``rebalance=True`` is for the mapInPandas kernel consumers (decode /
    blockhash / frame sampling): a 1-split fixture scan otherwise runs
    the whole per-payload kernel in ONE task (measured: the 0.6 s
    serial stage under mm_dedup_perceptual, guide §2.4 straggler).
    load_table's rebalance is scale-adaptive, so at 100 TB — where the
    scan fans out natively — no payload shuffle happens. Metadata-only
    consumers (manifest, token budget) keep the shuffle-free scan."""
    docs = load_table(spark, sf_dir, "documents", rebalance=rebalance)
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


def _half_up6(x):
    """round(x, 6) with HALF_UP ties (SQL semantics), not banker's."""
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


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
    vectorized decoder would run.

    No rebalance (r15, VERDICT r14 #3): the stub decode kernel is
    light enough that the fixture-scale round-robin costs more than
    the parallelism buys — A/B'd both ways at sf0.1 (isolated exec min
    0.81 s with the r14 rebalance vs 0.59 s without, −27%; bench walls
    in BENCH_r15). At 100 TB the scan fans out
    natively and load_table's adaptive gate made the rebalance a no-op
    anyway, so this is purely the fixture-wall decision the r14
    verdict asked to settle by measurement. A deployment that mounts a
    REAL codec here (PIL/ffmpeg — orders of magnitude more per-row CPU
    than the stub) should flip rebalance back on; the blockhash kernel
    below keeps it for exactly that reason."""
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
                    # explicit HALF_UP: pandas .round is banker's, the
                    # DuckDB oracle's round() is half-away — they differ
                    # on exact 6-decimal midpoints (e.g. 33/128)
                    "aspect_ratio": _half_up6(
                        pdf["width"].to_numpy() / pdf["height"].to_numpy()
                    ),
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


# DuckDB twin of the stubbed decode: the fixture payload is UTF-8 of
# ASCII text, so bytes == characters and the polynomial checksum is a
# scalar-state character fold (scalar accumulator — immune to the
# DuckDB struct-lambda sequential-update hazard documented at
# timeseries.py::TS_HOLT_WINTERS_SQL). This upgrades the mapInPandas
# seam from rows-only to full hash-checked: the Python decode stub and
# this SQL must produce identical integers. If a future fixture ships
# non-ASCII text the byte/char equivalence breaks and this oracle must
# fall back to rows-only.
MM_EXTRACT_FEATURES_SQL = """
WITH media AS (
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           text,
           CAST(n_chars % 1920 + 16 AS INT) AS width,
           CAST(n_chars % 1080 + 16 AS INT) AS height
    FROM documents
)
SELECT doc_id, modality,
       CAST(length(text) AS INT) AS n_bytes,
       CAST(CASE WHEN length(text) = 0 THEN -1
                 ELSE ascii(substr(text, 1, 1)) END AS INT) AS first_byte,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(text, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * 131 + x) % 1000000007) AS checksum,
       round(CAST(width AS DOUBLE) / height, 6) AS aspect_ratio
FROM media
"""


FRAME_FPS = 1.0       # sample cadence
FRAME_CAP = 8         # max frames per asset
FRAME_TARGET = 224    # fit-resize box (aspect preserved)

FRAME_SCHEMA = (
    "doc_id long, n_frames long, frame_idx int, t_s double, "
    "out_w long, out_h long"
)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + fit-resize planning for video assets — the
    1→N ``mapInPandas`` shape (output batch longer than input batch)
    that a real ffmpeg keyframe sampler plugs into.

    Per video: frames at 1 fps capped at 8, each with its sample
    timestamp and the 224-box fit-resize dims. The resize math is
    integer-exact (``dim*224 // max_dim``) so, unlike the stubbed
    decode in :func:`mm_extract_features`, this whole pipeline is
    DuckDB-expressible and sits behind the full oracle gate. The
    sampler itself runs in Python over Arrow batches — the real
    decoder's seat — not as an exploded JVM expression.
    """
    media = build_media_table(spark, sf_dir).filter(
        F.col("modality") == "video"
    ).select("doc_id", "width", "height", "duration_s")
    # no rebalance (r15): the sampler is pure pandas index math over 4
    # narrow columns on 1/3 of the rows — the round-robin cost the r14
    # bench +29% at fixture scale (see mm_extract_features above for
    # the full A/B argument; measured 0.72 → 0.42 s isolated exec)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = (
                pdf["duration_s"].apply(lambda d: int(d) * int(FRAME_FPS))
                .clip(lower=1, upper=FRAME_CAP)
                .astype("int64")
            )
            rep = pdf.index.repeat(n)
            out = pdf.loc[rep].reset_index(drop=True)
            out["n_frames"] = n.loc[rep].reset_index(drop=True)
            idx = [i for c in n for i in range(c)]
            out["frame_idx"] = pd.Series(idx, dtype="int32")
            out["t_s"] = out["frame_idx"] / FRAME_FPS
            mx = out[["width", "height"]].max(axis=1).astype("int64")
            out["out_w"] = out["width"].astype("int64") * FRAME_TARGET // mx
            out["out_h"] = out["height"].astype("int64") * FRAME_TARGET // mx
            yield out[["doc_id", "n_frames", "frame_idx", "t_s", "out_w", "out_h"]]

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


MM_FRAME_SAMPLE_SQL = """
WITH media AS (
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           CAST(n_chars % 1920 + 16 AS BIGINT) AS width,
           CAST(n_chars % 1080 + 16 AS BIGINT) AS height,
           round(n_chars / 37.0, 6) AS duration_s
    FROM documents
),
video AS (
    SELECT *, least(greatest(CAST(floor(duration_s) AS BIGINT), 1), 8)
              AS n_frames
    FROM media WHERE modality = 'video'
)
SELECT doc_id, n_frames,
       CAST(f.idx AS INT) AS frame_idx,
       CAST(f.idx AS DOUBLE) AS t_s,
       width  * 224 // greatest(width, height) AS out_w,
       height * 224 // greatest(width, height) AS out_h
FROM video, (SELECT unnest(range(0, 8)) AS idx) f
WHERE f.idx < n_frames
"""


# --------------------------------------------------------------------------
# Multimodal token accounting — VLM sequence-length budgeting
# --------------------------------------------------------------------------

PATCH = 16  # ViT-style patch edge
AUDIO_FPS = 25  # frames per second of audio
VIDEO_FPS = 8  # sampled frames per second of video
FRAME_TOKENS = 64  # tokens per sampled video frame


def mm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset TOKEN accounting for a vision-language training mix:
    how many sequence positions each media asset consumes after
    encoding — image → ceil(w/16)·ceil(h/16) ViT patches, audio →
    25 tokens/s, video → 8 frames/s × 64 tokens/frame. The number
    every multimodal packer/batcher needs before it can budget
    sequence length; all INTEGER arithmetic (ceil-division identities,
    duration reconstructed exactly from its 6-decimal encoding) so the
    hash gate is airtight. Pure per-row projection: no shuffle, prunes
    the payload column (metadata-only scan, same property the
    manifest test pins).
    """
    media = build_media_table(spark, sf_dir)
    # duration_s = round(n_chars/37, 6) → n_chars recovered exactly
    n_chars = F.round(F.col("duration_s") * 37).cast("long")
    patches = ((F.col("width") + PATCH - 1).cast("long") / PATCH).cast(
        "long"
    ) * ((F.col("height") + PATCH - 1).cast("long") / PATCH).cast("long")
    audio_tokens = ((n_chars * AUDIO_FPS + 36) / 37).cast("long")
    video_tokens = ((n_chars * VIDEO_FPS + 36) / 37).cast("long") * FRAME_TOKENS
    media_tokens = (
        F.when(F.col("modality") == "image", patches)
        .when(F.col("modality") == "audio", audio_tokens)
        .otherwise(video_tokens)
    )
    return media.select(
        "doc_id",
        "modality",
        media_tokens.alias("media_tokens"),
        (media_tokens + 2).alias("seq_len"),  # +BOS/EOS
    )


MM_TOKEN_BUDGET_SQL = f"""
WITH media AS (
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           CAST(n_chars % 1920 + 16 AS INT) AS width,
           CAST(n_chars % 1080 + 16 AS INT) AS height,
           n_chars
    FROM documents
), toks AS (
    SELECT doc_id, modality,
           CASE modality
               WHEN 'image' THEN ((width + {PATCH - 1}) // {PATCH})
                                 * ((height + {PATCH - 1}) // {PATCH})
               WHEN 'audio' THEN (n_chars * {AUDIO_FPS} + 36) // 37
               ELSE ((n_chars * {VIDEO_FPS} + 36) // 37) * {FRAME_TOKENS}
           END AS media_tokens
    FROM media
)
SELECT doc_id, modality,
       CAST(media_tokens AS BIGINT) AS media_tokens,
       CAST(media_tokens + 2 AS BIGINT) AS seq_len
FROM toks
"""




# --------------------------------------------------------------------------
# Content-addressed payload dedup (binary-column near-dup groundwork)
# --------------------------------------------------------------------------

def mm_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup over the BINARY payload column: md5 the
    raw bytes (never decoded — the digest is the content address, the
    same trick object stores and training-data lakes use to kill exact
    re-crawls of the same asset), emit the content-address
    inventory (one row per distinct byte string: copy count, modality
    spread, min-id keeper, and the bytes a dedup pass would reclaim —
    0 for singletons; the shipped fixtures contain no byte-identical
    payloads, so the >1-copy path is pinned by a synthetic test
    instead of the oracle row). The perceptual near-dup upgrade slots in
    at the digest expression (pHash over decoded pixels via the
    mapInPandas decode seam) with the SAME grouping plan.

    Scale shape: one scan, md5 computed JVM-side per row, one
    map-side-combinable aggregation on (modality, digest) — the
    classic content-address shuffle, never payload x payload.
    """
    media = build_media_table(spark, sf_dir)
    return (
        media.groupBy(F.md5(F.col("payload")).alias("payload_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            # the same bytes may be re-ingested under DIFFERENT claimed
            # modalities — content addressing ignores metadata, so the
            # group keys on the digest alone and reports the spread
            F.countDistinct("modality").alias("n_modalities"),
            F.min("doc_id").alias("keep_doc"),
            (
                (F.count(F.lit(1)) - 1) * F.max(F.octet_length("payload"))
            ).cast("long").alias("reclaimable_bytes"),
        )
    )


MM_DEDUP_PAYLOAD_SQL = """
WITH media AS (
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
           -- DuckDB's md5 takes VARCHAR; hashing the text is byte-
           -- identical to Spark's md5 over the utf-8 payload bytes
           text,
           encode(text) AS payload
    FROM documents
)
SELECT md5(text) AS payload_md5,
       count(*) AS n_copies,
       count(DISTINCT modality) AS n_modalities,
       min(doc_id) AS keep_doc,
       CAST((count(*) - 1) * max(octet_length(payload)) AS BIGINT)
           AS reclaimable_bytes
FROM media
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Perceptual near-dup — blockhash over the decoded-pixel seam
# --------------------------------------------------------------------------

PHASH_GRID = 64        # 8x8 grayscale render
PHASH_BANDS = 4        # pigeonhole bands over the 64-bit digest
PHASH_BAND_BITS = 16
PHASH_HAM_MAX = 3      # <=3 bit flips → >=1 exact band (guaranteed recall)
PHASH_BUCKET_CAP = 64  # hot-bucket cap, same discipline as dedup_minhash_lsh

_PHASH_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int"


def _render_stub(payload: bytes):
    """STUB renderer: payload bytes → deterministic 8x8 grayscale
    (64 pixels). A real deployment decodes the image and downsamples
    (PIL ``Image.resize((8, 8))``); no codecs ship in this container,
    so the stand-in renders a content histogram of the payload — md5 of
    each space-separated byte run, binned mod 64 — which has the
    locality property a real thumbnail has (small payload edits move
    few pixels), the property pHash/blockhash exploits.
    """
    import hashlib

    import numpy as np

    px = np.zeros(PHASH_GRID, dtype=np.int64)
    for w in payload.decode("utf-8", errors="ignore").split(" "):
        if w:
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            px[h % PHASH_GRID] += 1
    return px


def _phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + 4x16-bit blockhash bands via the ``mapInPandas`` decode
    seam (the same seat :func:`mm_extract_features` gives a real codec):
    render 64 pixels, threshold each at the median pixel (the blockhash
    algorithm), pack bits into 16-bit band values."""
    import numpy as np

    media = build_media_table(spark, sf_dir, rebalance=True).select("doc_id", "payload")
    pow2 = 1 << np.arange(PHASH_BAND_BITS, dtype=np.int64)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bands = np.zeros((len(pdf), PHASH_BANDS), dtype=np.int32)
            for r, payload in enumerate(pdf["payload"]):
                px = _render_stub(bytes(payload))
                bits = px > np.median(px)
                for b in range(PHASH_BANDS):
                    seg = bits[b * PHASH_BAND_BITS:(b + 1) * PHASH_BAND_BITS]
                    bands[r, b] = int(seg @ pow2)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{f"b{b}": bands[:, b] for b in range(PHASH_BANDS)},
                }
            )

    return media.mapInPandas(render, schema=_PHASH_SCHEMA)


def mm_dedup_perceptual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the media payloads — the image
    twin of MinHash-LSH (VERDICT r5 #3): blockhash digest from the
    decoded-pixel seam, hamming-banded candidates, exact-hamming verify
    at <= PHASH_HAM_MAX.

    Banding is pigeonhole-exact: 4 bands x 16 bits means any pair
    within hamming 3 shares at least one whole band, so recall vs
    brute-force hamming is 1.0 outside capped hot buckets
    (tests/test_multimodal.py pins it). Single-pass plan: the bucket
    collect carries each member's FULL signature in its struct, so the
    verify needs no join back to the signature relation — one
    mapInPandas scan, one band-shaped shuffle, in-bucket pair
    expansion bounded by PHASH_BUCKET_CAP, never payload x payload.
    """
    sig = _phash_signatures(spark, sf_dir)
    member = F.struct(
        "doc_id", *[f"b{b}" for b in range(PHASH_BANDS)]
    ).alias("m")
    banded = sig.select(
        member,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.col(f"b{b}").alias("band_val"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("m", "band.band_idx", "band.band_val")
    buckets = (
        banded.groupBy("band_idx", "band_val")
        .agg(F.collect_list("m").alias("members"))
        .filter(
            (F.size("members") >= 2) & (F.size("members") <= PHASH_BUCKET_CAP)
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
    p = F.col("p")
    hamming = sum(
        F.bit_count(p["a"][f"b{b}"].bitwiseXOR(p["b"][f"b{b}"]))
        for b in range(PHASH_BANDS)
    )
    return (
        buckets.select(F.explode(pair_col).alias("p"))
        .select(
            p["a"]["doc_id"].alias("doc_a"),
            p["b"]["doc_id"].alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .distinct()
    )


# DuckDB twin of the full pipeline: histogram render (md5-prefix bin,
# byte==char on the ASCII fixtures), median threshold (DuckDB's
# median interpolates even counts exactly like np.median), band
# packing, capped-bucket candidates, exact hamming verify.
MM_DEDUP_PERCEPTUAL_SQL = """
WITH media AS (
    SELECT doc_id, text FROM documents
), tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM media
), binned AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 64 AS px
    FROM tok WHERE w <> ''
), counts AS (
    SELECT doc_id, px, count(*) AS v FROM binned GROUP BY 1, 2
), grid AS (
    SELECT m.doc_id, r.i, coalesce(c.v, 0) AS v
    FROM (SELECT doc_id FROM media) m
    CROSS JOIN (SELECT unnest(range(0, 64)) AS i) r
    LEFT JOIN counts c ON c.doc_id = m.doc_id AND c.px = r.i
), med AS (
    SELECT doc_id, median(v) AS md FROM grid GROUP BY 1
), bits AS (
    SELECT g.doc_id, g.i,
           CASE WHEN g.v > d.md THEN 1 ELSE 0 END AS bit
    FROM grid g JOIN med d USING (doc_id)
), bands AS (
    SELECT doc_id, CAST(i // 16 AS INT) AS band_idx,
           CAST(sum(bit * (1 << CAST(i % 16 AS INT))) AS INT) AS band_val
    FROM bits GROUP BY 1, 2
), bsize AS (
    SELECT band_idx, band_val, count(*) AS n FROM bands GROUP BY 1, 2
), okband AS (
    SELECT b.doc_id, b.band_idx, b.band_val
    FROM bands b JOIN bsize s USING (band_idx, band_val)
    WHERE s.n BETWEEN 2 AND 64
), sig AS (
    SELECT doc_id,
           max(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
           max(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
           max(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
           max(CASE WHEN band_idx = 3 THEN band_val END) AS b3
    FROM bands GROUP BY 1
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM okband a JOIN okband b USING (band_idx, band_val)
    WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
            AS INT) AS hamming
FROM cand c
JOIN sig x ON x.doc_id = c.doc_a
JOIN sig y ON y.doc_id = c.doc_b
WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3
"""


# --------------------------------------------------------------------------
# Contrastive image-text pair construction (CLIP-style training prep)
# --------------------------------------------------------------------------

CONTRASTIVE_NEGATIVES = 3


def mm_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style contrastive training pairs: every image asset keeps
    its own document text as the positive caption and draws
    CONTRASTIVE_NEGATIVES derandomized negative captions from other
    documents (hash of (anchor, k) → offset in [1, n−1], so a
    negative can never alias the positive). The derandomization makes
    the pair set reproducible across runs/engines/cluster sizes —
    re-shuffling epochs re-key on an epoch salt, not on RNG state.

    Scale shape: the anchor set is a modality filter on the manifest
    (payload column pruned — the pairing needs ids, not bytes); the
    caption fetch is ONE equi-join on caption_doc_id (the corpus
    shuffles once, (1+K)·n_images probe rows); the corpus count rides
    a 1-row broadcast."""
    media = (
        build_media_table(spark, sf_dir)
        .filter(F.col("modality") == "image")
        .select("doc_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    caps = docs.select(
        F.col("doc_id").alias("caption_doc_id"),
        F.size(F.split("text", " ")).alias("caption_tokens"),
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    pos = media.select(
        "doc_id",
        F.lit(0).cast("long").alias("k"),
        F.col("doc_id").alias("caption_doc_id"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("k"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    neg = (
        media.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.lit(CONTRASTIVE_NEGATIVES).cast("long"),
                )
            ).alias("k"),
        )
        .withColumn(
            "caption_doc_id",
            (F.col("doc_id") + 1 + F.pmod(h, F.col("n") - 1)) % F.col("n"),
        )
        .select("doc_id", "k", "caption_doc_id")
    )
    # the caption fetch shuffles BOTH sides on caption_doc_id with the
    # narrow caps projection as the shuffle-hash build (r9 broadcast
    # census: left alone, Catalyst statically broadcast the
    # corpus-sized caps relation — the docstring's 'corpus shuffles
    # once' contract, now pinned instead of assumed)
    return (
        pos.unionByName(neg)
        .join(caps.hint("shuffle_hash"), "caption_doc_id")
        .select(
            "doc_id",
            "k",
            "caption_doc_id",
            F.when(F.col("k") == 0, 1).otherwise(0).alias("is_positive"),
            "caption_tokens",
        )
    )


MM_CONTRASTIVE_PAIRS_SQL = f"""
WITH caps AS (
    SELECT doc_id AS caption_doc_id,
           len(string_split(text, ' ')) AS caption_tokens
    FROM documents
), nn AS (SELECT count(*) AS n FROM documents),
anchors AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
pos AS (
    SELECT doc_id, CAST(0 AS BIGINT) AS k, doc_id AS caption_doc_id
    FROM anchors
), neg AS (
    SELECT a.doc_id, ks.k,
           (a.doc_id + 1
            + (CAST(('0x' || substr(md5(a.doc_id || ':' || ks.k), 1, 15))
                    AS BIGINT) % (nn.n - 1))) % nn.n AS caption_doc_id
    FROM anchors a
    CROSS JOIN nn
    CROSS JOIN (SELECT unnest(range(1, {CONTRASTIVE_NEGATIVES + 1})) AS k) ks
), pairs AS (
    SELECT * FROM pos UNION ALL SELECT * FROM neg
)
SELECT p.doc_id, p.k, p.caption_doc_id,
       CASE WHEN p.k = 0 THEN 1 ELSE 0 END AS is_positive,
       c.caption_tokens
FROM pairs p JOIN caps c USING (caption_doc_id)
"""


QUERIES = {
    "mm_dedup_payload": mm_dedup_payload,
    "mm_dedup_perceptual": mm_dedup_perceptual,
    "mm_token_budget": mm_token_budget,
    "mm_manifest": mm_manifest,
    "mm_extract_features": mm_extract_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_contrastive_pairs": mm_contrastive_pairs,
}

ORACLES = {
    "mm_dedup_payload": MM_DEDUP_PAYLOAD_SQL,
    "mm_dedup_perceptual": MM_DEDUP_PERCEPTUAL_SQL,
    "mm_token_budget": MM_TOKEN_BUDGET_SQL,
    "mm_manifest": MM_MANIFEST_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    # mm_extract_features: decode is a stubbed codec behind mapInPandas,
    # but the stub's byte math is DuckDB-expressible on ASCII fixtures —
    # full hash check (see MM_EXTRACT_FEATURES_SQL).
    "mm_extract_features": MM_EXTRACT_FEATURES_SQL,
    "mm_contrastive_pairs": MM_CONTRASTIVE_PAIRS_SQL,
}
