"""Spectral audio fingerprint (multimodal.audio_spectral_hash): exact
volume invariance, tone discrimination (the case the envelope
average-hash is blind to — demonstrated as a control), and near-pair
machinery over the spectral bits."""

from __future__ import annotations

import numpy as np
import pytest

from dod_etl_spark.operators.media_codec import encode_wav, spectral_cells
from dod_etl_spark.operators.multimodal import (
    Codec,
    audio_spectral_hash,
    perceptual_hash,
    spectral_near_pairs,
)

SR = 16000


def tone(freq: float, volume: float = 1.0, secs: float = 0.5, phase: float = 0.0):
    t = np.arange(int(SR * secs)) / SR
    return volume * np.sin(2 * np.pi * freq * t + phase)


def _media_df(spark, rows):
    from dod_etl_spark.operators.multimodal import MEDIA_SCHEMA

    data = [
        {
            "media_id": mid,
            "content": bytearray(content),
            "meta": {
                "modality": "audio",
                "format": "wav",
                "width": None,
                "height": None,
                "duration_ms": None,
                "sample_rate": SR,
            },
        }
        for (mid, content) in rows
    ]
    return spark.createDataFrame(data, MEDIA_SCHEMA)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


@pytest.fixture(scope="module")
def hashes(spark):
    rows = [
        (1, encode_wav(tone(440, 1.0))),
        (2, encode_wav(tone(440, 0.3))),  # same tone, -10 dB
        (3, encode_wav(tone(2000, 1.0))),  # different tone, same volume
        (4, encode_wav(np.clip(tone(440, 0.8) + tone(441, 0.1), -1, 1))),  # near-dup mix
    ]
    df = _media_df(spark, rows)
    spectral = {
        r["media_id"]: r["phash"]
        for r in audio_spectral_hash(df, Codec(fake=False)).collect()
    }
    envelope = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(df, Codec(fake=False)).collect()
    }
    return df, spectral, envelope


def test_spectral_volume_invariance_and_tone_discrimination(hashes):
    _, spectral, _ = hashes
    # exact volume invariance: scaling cancels in the window norm
    assert spectral[1] == spectral[2]
    # tonal content separates
    assert _hamming(spectral[1], spectral[3]) >= 10
    # a slightly-detuned mix stays near
    assert _hamming(spectral[1], spectral[4]) <= 5


def test_envelope_hash_is_carrier_blind_control(spark):
    """The motivating gap: the SAME amplitude modulation over two very
    different carriers gives (near-)identical envelopes — the
    average-hash cannot separate what the spectral hash separates."""
    t = np.arange(int(SR * 0.5)) / SR
    env = 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 2 * t))
    rows = [
        (5, encode_wav(env * np.sin(2 * np.pi * 800 * t))),
        (6, encode_wav(env * np.sin(2 * np.pi * 3000 * t))),
    ]
    df = _media_df(spark, rows)
    envelope = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(df, Codec(fake=False)).collect()
    }
    spectral = {
        r["media_id"]: r["phash"]
        for r in audio_spectral_hash(df, Codec(fake=False)).collect()
    }
    assert _hamming(envelope[5], envelope[6]) <= 3  # envelope collides
    assert _hamming(spectral[5], spectral[6]) >= 10  # spectral separates


def test_spectral_near_pairs_machinery(spark, hashes):
    df, _, _ = hashes
    pairs = {
        (r["id_1"], r["id_2"])
        for r in spectral_near_pairs(df, Codec(fake=False)).collect()
    }
    assert (1, 2) in pairs  # volume variant pairs
    assert (1, 4) in pairs  # detuned mix pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs  # different tone does not


def test_spectral_cells_shape_and_silence():
    cells = spectral_cells(encode_wav(tone(440)), "wav", n_windows=12, n_bands=5)
    assert len(cells) == 60
    assert all(0.0 <= c <= 1.0 for c in cells)
    # window-normalized: each window's 5 bands sum to ~1 for a tone
    for w in range(12):
        assert abs(sum(cells[w * 5 : (w + 1) * 5]) - 1.0) < 1e-9
    silent = spectral_cells(encode_wav(np.zeros(SR // 2)), "wav")
    assert set(silent) == {0.0}
