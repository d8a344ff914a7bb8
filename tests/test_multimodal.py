"""Multimodal plumbing: binary payload integrity + deterministic stub
features through the real mapInPandas path."""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_influx_storage_service_spark.operators.multimodal import (
    build_media_table,
    mm_extract_features,
)


def test_payload_roundtrip(spark, sf_dir):
    media = build_media_table(spark, sf_dir)
    row = media.filter(F.col("doc_id") == 0).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.payload.decode("utf-8")  # valid UTF-8 round-trip
    assert row.modality in ("image", "audio", "video")


def test_feature_extraction_matches_python(spark, sf_dir):
    """The mapInPandas stub must agree with a driver-side recompute —
    pins Arrow binary transfer + batch iteration correctness."""
    media = {r.doc_id: r for r in build_media_table(spark, sf_dir).collect()}
    feats = mm_extract_features(spark, sf_dir).collect()
    assert len(feats) == len(media)
    for r in feats[:50]:
        payload = media[r.doc_id].payload
        assert r.n_bytes == len(payload)
        assert r.first_byte == payload[0]
        checksum = 0
        for by in payload:
            checksum = (checksum * 131 + by) % 1000000007
        assert r.checksum == checksum


def test_manifest_prunes_payload_column(spark, sf_dir):
    """Metadata rollups must not read payload bytes: the optimized plan
    should not carry the payload column into the aggregate (octet_length
    is pushed into the project before the agg)."""
    from mqtt_influx_storage_service_spark.operators.multimodal import mm_manifest

    plan = mm_manifest(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    agg_lines = [ln for ln in plan.split("\n") if "Aggregate" in ln]
    assert agg_lines, plan
    assert "payload" not in agg_lines[0] or "octet_length" in agg_lines[0]


def test_payload_dedup_finds_cross_modality_copies(spark, tmp_path):
    """Byte-identical payloads re-ingested under different doc_ids (and
    hence different derived modalities) collapse to ONE content-address
    group with the right copy count, keeper, and reclaimable bytes."""
    import pandas as pd

    from mqtt_influx_storage_service_spark.operators.multimodal import (
        mm_dedup_payload,
    )

    text_a = "same bytes every time"
    rows = [
        (0, text_a, "en", "s", len(text_a)),   # modality image (0%3)
        (1, text_a, "en", "s", len(text_a)),   # audio — same bytes
        (2, "unique one", "en", "s", 10),
        (5, text_a, "en", "s", len(text_a)),   # video (5%3=2) — same bytes
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")

    out = {r.payload_md5: r for r in mm_dedup_payload(spark, str(tmp_path)).collect()}
    dups = [r for r in out.values() if r.n_copies > 1]
    assert len(dups) == 1
    g = dups[0]
    assert g.n_copies == 3
    assert g.n_modalities == 3      # same bytes under 3 claimed modalities
    assert g.keep_doc == 0
    assert g.reclaimable_bytes == 2 * len(text_a.encode())
    singles = [r for r in out.values() if r.n_copies == 1]
    assert len(singles) == 1 and singles[0].reclaimable_bytes == 0


def test_perceptual_recall_vs_exact_hamming(spark, sf_dir):
    """Pigeonhole guarantee: 4 bands x 16 bits means every pair within
    hamming <= 3 shares a whole band, so outside capped hot buckets the
    banded operator reproduces brute-force exact hamming verbatim —
    precision 1.0 always, recall 1.0 on the uncapped set."""
    from mqtt_influx_storage_service_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_BUCKET_CAP,
        PHASH_HAM_MAX,
        _phash_signatures,
        mm_dedup_perceptual,
    )

    sig = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
           for r in _phash_signatures(spark, sf_dir).collect()}
    # capped band buckets: pairs ALL of whose shared bands are hot are
    # legitimately dropped by the cap
    from collections import Counter

    hot = {
        (b, v)
        for (b, v), n in Counter(
            (b, bands[b]) for bands in sig.values() for b in range(PHASH_BANDS)
        ).items()
        if n > PHASH_BUCKET_CAP
    }
    ids = sorted(sig)
    brute = set()
    for i, a in enumerate(ids):
        for b_ in ids[i + 1:]:
            x, y = sig[a], sig[b_]
            h = sum(bin(x[k] ^ y[k]).count("1") for k in range(PHASH_BANDS))
            if h <= PHASH_HAM_MAX:
                shared = [k for k in range(PHASH_BANDS) if x[k] == y[k]]
                assert shared, "pigeonhole violated"
                if any((k, x[k]) not in hot for k in shared):
                    brute.add((a, b_))
    got = {(r.doc_a, r.doc_b)
           for r in mm_dedup_perceptual(spark, sf_dir).collect()}
    assert got == brute
    assert len(brute) > 0  # the fixture near-dups are actually caught


def test_contrastive_pairs_structure(spark, sf_dir):
    """Every image anchor carries exactly one positive (its own doc)
    plus CONTRASTIVE_NEGATIVES negatives; a negative can never alias
    the positive caption; the pair set is deterministic (same result
    on a second run)."""
    from mqtt_influx_storage_service_spark.operators.multimodal import (
        CONTRASTIVE_NEGATIVES,
        mm_contrastive_pairs,
    )

    rows = mm_contrastive_pairs(spark, sf_dir).collect()
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.doc_id, []).append(r)
    for anchor, prs in by_anchor.items():
        assert len(prs) == 1 + CONTRASTIVE_NEGATIVES
        pos = [p for p in prs if p.is_positive == 1]
        assert len(pos) == 1 and pos[0].caption_doc_id == anchor
        for p in prs:
            if p.is_positive == 0:
                assert p.caption_doc_id != anchor
    again = mm_contrastive_pairs(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
