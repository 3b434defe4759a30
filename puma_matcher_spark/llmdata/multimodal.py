"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via mapInPandas.

The reference shells out to a Python blockhash per image row
(analyser/PictureHashAnalyser2.scala:48,71-125 — writes blockhash.py to
/tmp and spawns a process per row!).  The rebuild keeps the *plumbing*
real — schema contracts, Arrow batching, partition sizing — and stubs the
codec layer: the container has no PIL/ffmpeg, so ``decode_image`` is a
deterministic fake behind the same signature (clearly marked; swap the
kernel in production, nothing else changes).

Scale notes: binary payloads ride the shuffle only if you shuffle them —
process media in the partition where the scan produced it (mapInPandas
before any wide transform), emit compact features (hashes, embeddings),
and only shuffle those.  ``spark.sql.files.maxPartitionBytes`` sizes the
per-task batch; Arrow batch size bounds peak memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("payload", StringType()),  # binary stand-in on fixtures
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("perceptual_hash", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_blockhash(payload: bytes) -> str:
    """Deterministic stand-in for the 256-bit blockhash (PUBLIC algorithm;
    real impl needs PIL — NOT available here).  Produces a stable
    256-bit hex string from the payload so downstream Hamming machinery
    is exercisable."""
    h = hashlib.sha256(payload).hexdigest()
    return h  # 256 bits as 64 hex chars


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: payload → (hash, size).

    Arrow-batched; one output row per input row; the codec call is the
    single line to swap for a real decoder.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].fillna("")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "perceptual_hash": payloads.map(
                        lambda p: _fake_blockhash(p.encode())
                    ),
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(process, FEATURE_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode — requires PIL/opencv, not present in this
    container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; swap _fake_blockhash for the "
        "real blockhash kernel in production"
    )
