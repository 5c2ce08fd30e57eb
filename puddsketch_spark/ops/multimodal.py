"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/feature kernels are STUBBED (this container ships no image/audio
libraries) behind ``decoder=`` hooks — the Spark-side plumbing (schemas,
mapInPandas batch shape, partition sizing, metadata passthrough) is real and
tested with a deterministic fake decoder. Swap ``fake_image_decoder`` for a
PIL/ffmpeg-backed callable on a real cluster; nothing else changes.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "fake_image_decoder",
    "decode_and_featurize",
    "frame_sample_plan",
]

# canonical multimodal table shape: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("feat", ArrayType(FloatType(), False), True),
        StructField("decode_ok", BooleanType(), False),
    ]
)


def fake_image_decoder(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derive from the
    payload bytes so tests are stable. A real build replaces this with e.g.
    PIL decode + resize + channel means (NotImplementedError if neither)."""
    if payload is None:
        raise ValueError("null payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        raise ValueError("empty payload")
    chunks = np.array_split(arr.astype(np.float32), dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


def decode_and_featurize(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_image_decoder,
    batch_limit_mb: int = 256,
) -> DataFrame:
    """payload binary -> feature vector via mapInPandas.

    Real-scale notes: binary payloads dominate partition size — cap
    spark.sql.files.maxPartitionBytes (or repartition by size) so one Arrow
    batch stays under ``batch_limit_mb``; decode failures become
    decode_ok=false rows rather than task failures (poison-pill isolation).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append([float(x) for x in decoder(payload)])
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(duration_ms: int, fps_target: float = 1.0, max_frames: int = 32) -> list[int]:
    """Deterministic frame-sampling timestamps for video payloads (ms).
    Pure planning logic — the actual frame grab is the stubbed decoder's job."""
    if duration_ms <= 0:
        return []
    n = min(max_frames, max(1, int(duration_ms / 1000.0 * fps_target)))
    step = duration_ms / n
    return [int(step * i + step / 2) for i in range(n)]
