"""Multimodal column plumbing: binary + metadata schema, mapInPandas
feature extraction, frame sampling, resize metadata, codec stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dod_etl_spark.operators.multimodal import (
    Codec,
    MEDIA_SCHEMA,
    content_fingerprint,
    extract_features,
    frame_sample_plan,
    resize_stub,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"imagebytes-1", ("image", "png", 64, 64, None, None)),
        (2, b"audiobytes-2", ("audio", "wav", None, None, 4000, 16000)),
        (3, b"videobytes-3", ("video", "mp4", 320, 240, 2500, None)),
        (4, None, ("image", "png", 8, 8, None, None)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = extract_features(media, Codec(fake=True), feature_dim=16).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 4
    # Fake decode = sha256(content); fingerprint matches hashlib.
    assert by_id[1]["content_sha"] == hashlib.sha256(b"imagebytes-1").hexdigest()
    assert by_id[4]["content_sha"] == hashlib.sha256(b"").hexdigest()  # null content
    assert all(r["feature_dim"] == 16 and r["feature_norm"] > 0 for r in out)
    # Determinism across runs.
    again = {r["media_id"]: r["feature_norm"] for r in extract_features(media).collect()}
    assert all(again[k] == by_id[k]["feature_norm"] for k in again)


def test_real_codec_is_a_clear_stub(media):
    with pytest.raises(NotImplementedError):
        Codec(fake=False).decode(b"x", "png")


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # Only the video (2500 ms) -> frames at 0, 1000, 2000.
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000]
    assert all(r["media_id"] == 3 for r in frames)


def test_resize_updates_metadata_only(spark, media):
    out = resize_stub(media, 32, 32)
    r = out.filter(F.col("media_id") == 1).first()
    assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
    assert r["content"] == b"imagebytes-1"  # payload untouched by the stub


def test_content_fingerprint_jvm_side(spark, media):
    out = content_fingerprint(media).filter(F.col("media_id") == 1).first()
    assert out["content_sha"] == hashlib.sha256(b"imagebytes-1").hexdigest()


def test_perceptual_hash_deterministic_and_bounded(spark, media):
    import hashlib as _hl

    from dod_etl_spark.operators.multimodal import PHASH_BITS, perceptual_hash

    out = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert len(out) == 4
    assert all(0 <= h < (1 << PHASH_BITS) for h in out.values())
    # Reference recomputation of the aHash from the fake decode.
    sig = _hl.sha256(b"imagebytes-1").digest()
    cells = [sig[i % len(sig)] for i in range(PHASH_BITS)]
    mean = sum(cells) / PHASH_BITS
    want = sum(1 << j for j, px in enumerate(cells) if px > mean)
    assert out[1] == want
    again = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert again == out


def test_phash_near_pairs_same_content_only(spark):
    """With the avalanche fake codec, identical payloads are hamming-0
    pairs and distinct payloads don't collide — pinning the banded
    pair machinery end-to-end over binary media."""
    from dod_etl_spark.operators.multimodal import MEDIA_SCHEMA, phash_near_pairs

    rows = [
        (1, b"same-bytes", ("image", "png", 64, 64, None, None)),
        (2, b"same-bytes", ("image", "png", 64, 64, None, None)),
        (3, b"other-bytes", ("image", "png", 64, 64, None, None)),
        (4, b"same-bytes", ("image", "jpg", 32, 32, None, None)),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    pairs = {
        (r["id_1"], r["id_2"]) for r in phash_near_pairs(media, max_hamming=0).collect()
    }
    assert pairs == {(1, 2), (1, 4), (2, 4)}
    plan = phash_near_pairs(media)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
