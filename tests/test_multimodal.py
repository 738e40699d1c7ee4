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
