"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

Design (north-star operator family; no counterpart in the reference —
its type surface stops at timestamps, SURVEY §1.3):

- A multimodal column is `content: binary` + a `meta` struct
  (modality/format/width/height/duration_ms/sample_rate). Schema-first:
  everything downstream of decode is ordinary columnar data.
- Decode / feature-extract / resize / frame-sample run as mapInPandas
  stages: Arrow ships binary batches to Python whole-partition at a
  time — the sanctioned Python extension surface (SURVEY §2.8), never
  row-at-a-time UDFs.
- The codec seam (`Codec`) has a REAL pure-stdlib path — uncompressed
  BMP + PCM WAV via operators/media_codec.py (struct/wave/numpy only) —
  and a deterministic sha256 fake kept for cross-engine oracle replay.
  Compressed formats (png/jpeg/mp3/mp4) need PIL/ffmpeg, absent in this
  container, and raise NotImplementedError; swapping them in changes
  one dispatch function.

Scale notes: binary payloads dominate partition size — repartition by
`maxRecordsPerBatch`-compatible counts before mapInPandas (Arrow batch
memory = rows × payload); never groupBy a binary column (hash the
content to a fingerprint first — see `content_fingerprint`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),  # png|wav|mp4|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature_dim", IntegerType(), False),
        StructField("feature_norm", DoubleType(), False),
        StructField("content_sha", StringType(), False),
    ]
)


class Codec:
    """Codec seam with two modes:

    - fake=True (default, oracle mode): the "decoded" signal is the
      sha256 digest stream of the payload — deterministic and
      cross-engine replayable, so the DuckDB oracle can verify the full
      mapInPandas path byte-for-byte (queries/llm.py multimodal_features).
    - fake=False (real mode): pure-stdlib decode via
      operators/media_codec.py — uncompressed BMP (struct + numpy) and
      PCM WAV (wave). Perceptual hashing then runs on real pixels /
      amplitude envelopes, so near-dup pairs are PERCEPTUAL neighbors
      (same scene, different bytes), pinned by tests/test_media_codec.py.
      Compressed formats (png/jpeg/mp3/mp4) still raise
      NotImplementedError — they need PIL/ffmpeg, absent here.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def decode(self, content: bytes, fmt: str | None):
        """Fake mode: 32-byte digest stream. Real mode: a
        media_codec.Decoded (2D intensity grid + dims/sample-rate)."""
        if self.fake:
            return hashlib.sha256(content or b"").digest()
        from dod_etl_spark.operators import media_codec

        return media_codec.decode(content, fmt)

    def cells_fn(self) -> Callable[[bytes, str | None, int], list[float]]:
        """The worker-side (content, fmt, n_cells) -> cells closure.
        Fake mode inlines a stdlib-only lambda (workers need no package
        import); real mode closes over media_codec.decode_cells, pickled
        by reference — the session factory exports PYTHONPATH so Python
        workers can import it (session.py)."""
        if self.fake:

            def fake_cells(c: bytes, fmt: str | None, n: int) -> list[float]:
                d = hashlib.sha256(c or b"").digest()
                return [d[i % 32] for i in range(n)]

            return fake_cells
        from dod_etl_spark.operators.media_codec import decode_cells

        return decode_cells

    def spectral_cells_fn(self) -> Callable[[bytes, str | None, int], list[float]]:
        """Worker-side (content, fmt, n_cells) -> SPECTRAL cells (audio:
        FFT log-band energies, media_codec.spectral_cells). Fake mode:
        a differently-salted sha256 stream — same oracle-replay posture
        as cells_fn, avalanche so only byte-identical payloads collide."""
        if self.fake:

            def fake_spectral(c: bytes, fmt: str | None, n: int) -> list[float]:
                d = hashlib.sha256(b"spectral:" + (c or b"")).digest()
                return [d[i % 32] for i in range(n)]

            return fake_spectral
        from dod_etl_spark.operators.media_codec import spectral_cells

        def real_spectral(c: bytes, fmt: str | None, n: int) -> list[float]:
            # n = n_windows * SPECTRAL_BANDS (60 -> 12 windows x 5 bands)
            return spectral_cells(c, fmt, n_windows=n // SPECTRAL_BANDS)

        return real_spectral


def extract_features(
    media: DataFrame,
    codec: Codec | None = None,
    feature_dim: int = 16,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    Output: one row per media item with a feature vector summary
    (dim + L2 norm of the fake-decoded bytes) and a content fingerprint.
    Arrow moves the binary column in columnar batches; Python touches
    each partition exactly once. The input is spread to the session's
    core count first — Python decode throughput is per-partition, so a
    single-split input would serialize the whole decode."""
    from dod_etl_spark.catalog import spread

    media = spread(media)
    codec = codec or Codec()
    # In fake mode the closure is stdlib-only (no package references),
    # so Python workers need no dod_etl_spark on their path (the driver
    # harness may launch the session without our PYTHONPATH export).
    # Real mode closes over media_codec by reference — session.py's
    # PYTHONPATH export makes it worker-importable.
    cells_fn = codec.cells_fn()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            feats = [
                cells_fn(c, m["format"] if isinstance(m, dict) else None, feature_dim)
                for c, m in zip(pdf["content"], pdf["meta"])
            ]
            # Norm via exact sum of squared cells, then one sqrt and one
            # divide — engine-stable (no float accumulation in fake mode,
            # where cells are integer digest bytes).
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature_dim": feature_dim,
                    "feature_norm": [
                        math.sqrt(sum(x * x for x in f)) / 255.0 for f in feats
                    ],
                    "content_sha": [
                        hashlib.sha256(c or b"").hexdigest() for c in pdf["content"]
                    ],
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plan: explode each video into (media_id,
    frame_ts_ms) rows at a fixed cadence — pure column math on the
    duration metadata (JVM-side); the per-frame decode is then an
    `extract_features`-shaped mapInPandas over the sampled set."""
    vids = media.filter(F.col("meta.modality") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def content_fingerprint(media: DataFrame) -> DataFrame:
    """Exact binary dedup key: sha2 on the content column (JVM-side,
    no Python) — groupBy this, never the binary itself."""
    return media.withColumn("content_sha", F.sha2(F.col("content"), 256))


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only resize (fake-codec twin of resize_media): width/
    height updated, content passed through — keeps the plumbing testable
    where no decodable payload exists."""
    new_meta = F.struct(
        F.col("meta.modality").alias("modality"),
        F.col("meta.format").alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )
    return media.withColumn("meta", new_meta)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL pixel resize for decodable content via mapInPandas: BMP
    payloads are decoded, box-resampled per RGB channel, and re-encoded
    (media_codec.resize_bmp); non-image or non-BMP rows pass through
    with metadata updated only. Same Arrow batch shape as
    extract_features — pixels never leave the Python worker as anything
    but the re-encoded binary."""
    from dod_etl_spark.catalog import spread

    out_schema = media.schema
    meta_fields = [f.name for f in MEDIA_META.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dod_etl_spark.operators.media_codec import resize_bmp

        for pdf in batches:
            contents, metas = [], []
            for c, m in zip(pdf["content"], pdf["meta"]):
                meta = dict(m) if m is not None else {f: None for f in meta_fields}
                fmt = (meta.get("format") or "").lower()
                if fmt == "bmp" and c is not None:
                    c = resize_bmp(bytes(c), width, height)
                    meta["width"], meta["height"] = width, height
                elif meta.get("modality") == "image":
                    meta["width"], meta["height"] = width, height
                contents.append(c)
                metas.append(meta)
            out = pdf.copy()
            out["content"] = contents
            out["meta"] = metas
            yield out

    return spread(media).mapInPandas(gen, schema=out_schema)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), False),
    ]
)

PHASH_BITS = 60  # <= 60 keeps every 1<<j in signed-64 range (simhash rule)
SPECTRAL_BANDS = 5  # bands per window; 12 windows x 5 bands = 60 bits


def perceptual_hash(media: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Average-hash perceptual fingerprint per media item: decode,
    box-average the signal into PHASH_BITS cells (a 10x6 raster for
    images, 60 temporal windows for audio), threshold each cell against
    the mean -> one 60-bit integer.

    With the REAL codec (Codec(fake=False), operators/media_codec.py:
    stdlib BMP + WAV), this is a true average hash: the fixed cell
    raster makes it resize-robust, and the mean threshold makes it
    brightness/volume-invariant, so visually/acoustically similar media
    with entirely different bytes differ in few bits
    (tests/test_media_codec.py pins near < far separation). The fake
    sha256 mode remains for oracle replay — avalanche, so only
    byte-identical payloads collide there.

    Same mapInPandas shape as extract_features: Arrow-batched binary
    in, (media_id, BIGINT) out — fingerprints are the only thing that
    ever shuffles. Near-dup pairs come free from the SimHash band
    machinery (phash_near_pairs): a perceptual hash IS a simhash-typed
    fingerprint."""
    from dod_etl_spark.catalog import spread

    media = spread(media)
    codec = codec or Codec()
    cells_fn = codec.cells_fn()
    n_bits = PHASH_BITS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for c, m in zip(pdf["content"], pdf["meta"]):
                cells = cells_fn(c, m["format"] if isinstance(m, dict) else None, n_bits)
                mean = sum(cells) / n_bits
                h = 0
                for j, px in enumerate(cells):
                    if px > mean:
                        h |= 1 << j
                hashes.append(h)
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": hashes})

    return media.mapInPandas(gen, schema=PHASH_SCHEMA)


def phash_near_pairs(
    media: DataFrame,
    codec: Codec | None = None,
    max_hamming: int = 5,
    n_bands: int = 6,
) -> DataFrame:
    """Perceptual near-duplicate candidate pairs: banded blocking +
    exact hamming cut over the 60-bit fingerprints — literally
    operators.text_dedup.simhash_near_pairs applied to the perceptual
    hash column (pigeonhole guarantee: hamming <= n_bands - 1 pairs
    always share a band)."""
    from dod_etl_spark.operators.text_dedup import simhash_near_pairs

    fps = perceptual_hash(media, codec)
    return simhash_near_pairs(
        fps,
        id_col="media_id",
        fp_col="phash",
        max_hamming=max_hamming,
        n_bands=n_bands,
        n_bits=PHASH_BITS,
    )


def audio_spectral_hash(media: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Spectral perceptual fingerprint for AUDIO: 12 time windows x 5
    geometric frequency bands of rFFT energy (volume-normalized per
    window, media_codec.spectral_cells), each band thresholded against
    the window-uniform mean -> one 60-bit integer.

    Complements perceptual_hash (envelope average-hash): the envelope
    is blind to tonal content — two constant-volume tones at 440 Hz
    and 2 kHz hash identically there — while the spectral bands are
    exactly volume-invariant AND tone-discriminative (pinned in
    tests/test_multimodal_spectral.py). Same mapInPandas shape; only
    (media_id, BIGINT) ever shuffles; near-dup pairs come from the
    same SimHash band machinery (spectral_near_pairs)."""
    from dod_etl_spark.catalog import spread

    media = spread(media)
    codec = codec or Codec()
    cells_fn = codec.spectral_cells_fn()
    n_bits = PHASH_BITS
    mean = 1.0 / SPECTRAL_BANDS  # cells are window-normalized

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for c, m in zip(pdf["content"], pdf["meta"]):
                cells = cells_fn(c, m["format"] if isinstance(m, dict) else None, n_bits)
                # fake mode emits byte-valued cells: fall back to the
                # empirical mean so both modes threshold sensibly
                thr = mean if max(cells, default=0.0) <= 1.0 else sum(cells) / n_bits
                h = 0
                for j, px in enumerate(cells):
                    if px > thr:
                        h |= 1 << j
                hashes.append(h)
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": hashes})

    return media.mapInPandas(gen, schema=PHASH_SCHEMA)


def spectral_near_pairs(
    media: DataFrame,
    codec: Codec | None = None,
    max_hamming: int = 5,
    n_bands: int = 6,
) -> DataFrame:
    """Near-duplicate AUDIO pairs over the spectral fingerprints —
    simhash band blocking + exact hamming cut, identical machinery to
    phash_near_pairs."""
    from dod_etl_spark.operators.text_dedup import simhash_near_pairs

    fps = audio_spectral_hash(media, codec)
    return simhash_near_pairs(
        fps,
        id_col="media_id",
        fp_col="phash",
        max_hamming=max_hamming,
        n_bands=n_bands,
        n_bits=PHASH_BITS,
    )
