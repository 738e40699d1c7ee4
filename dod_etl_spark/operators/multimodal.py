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
- The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
  the codec call is isolated behind `Codec` with a deterministic fake
  for tests and a NotImplementedError real-codec slot. The Spark-side
  plumbing — schemas, batch iteration, partitioning — is real and
  tested; swapping in a real codec changes one function.

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
    """Codec seam. `decode` returns a deterministic pseudo-decode in test
    mode; the real-codec path raises until a codec library is installed
    (clearly-marked stub per the build contract)."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def decode(self, content: bytes, fmt: str | None) -> bytes:
        if self.fake:
            # Deterministic fake: the "decoded" signal is the sha256
            # digest stream of the payload — stable across runs/engines.
            return hashlib.sha256(content or b"").digest()
        raise NotImplementedError(
            "real codec not available in this environment; install PIL/ffmpeg "
            "and implement Codec.decode"
        )


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
    # Keep the pickled closure free of references to this package: in
    # fake mode the decode is inlined (stdlib only), so Python workers
    # need no dod_etl_spark on their path (the driver harness may launch
    # the session without our PYTHONPATH export). Real codecs require a
    # worker-importable module by nature.
    if codec.fake:
        decode_fn = lambda c, fmt: hashlib.sha256(c or b"").digest()  # noqa: E731
    else:
        decode_fn = codec.decode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            decoded = [
                decode_fn(c, m["format"] if isinstance(m, dict) else None)
                for c, m in zip(pdf["content"], pdf["meta"])
            ]
            # Norm via exact integer sum of squared bytes, then one sqrt
            # and one divide — engine-stable (no float accumulation).
            feats = [[b[i % len(b)] for i in range(feature_dim)] for b in decoded]
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
    """Resize: metadata transform is real (width/height updated); the
    pixel transform is the codec stub (fake mode passes content through
    so plumbing is testable end-to-end)."""
    new_meta = F.struct(
        F.col("meta.modality").alias("modality"),
        F.col("meta.format").alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )
    return media.withColumn("meta", new_meta)


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash", LongType(), False),
    ]
)

PHASH_BITS = 60  # <= 60 keeps every 1<<j in signed-64 range (simhash rule)


def perceptual_hash(media: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Average-hash perceptual fingerprint per media item: decode,
    tile the signal into PHASH_BITS cells, threshold each cell against
    the mean -> one 60-bit integer. Visually-near images differ in few
    bits (with a REAL codec; the fake sha256 decode is avalanche, so
    only identical payloads collide — the honest stub posture: the
    Spark-side plumbing, schema, and pair machinery are real and
    tested, hash QUALITY arrives with the codec).

    Same mapInPandas shape as extract_features: Arrow-batched binary
    in, (media_id, BIGINT) out — fingerprints are the only thing that
    ever shuffles. Near-dup pairs come free from the SimHash band
    machinery (phash_near_pairs): a perceptual hash IS a simhash-typed
    fingerprint."""
    from dod_etl_spark.catalog import spread

    media = spread(media)
    codec = codec or Codec()
    if codec.fake:
        decode_fn = lambda c, fmt: hashlib.sha256(c or b"").digest()  # noqa: E731
    else:
        decode_fn = codec.decode

    n_bits = PHASH_BITS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for c, m in zip(pdf["content"], pdf["meta"]):
                sig = decode_fn(c, m["format"] if isinstance(m, dict) else None)
                cells = [sig[i % len(sig)] for i in range(n_bits)]
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
