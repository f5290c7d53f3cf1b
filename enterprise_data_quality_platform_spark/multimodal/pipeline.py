"""Multimodal column pipeline (SURVEY.md §2.6 X7).

Pattern: media (image/audio/video) are opaque ``binary`` payload columns
with typed metadata; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched pandas iterators via ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

The actual codecs are NOT available in this environment, so the decode step
is a clearly-marked stub: ``decode_payload`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (seeded by
content hash) produces stable pseudo-features. Swap ``_fake_decode`` for a
PIL/ffmpeg call in a real deployment — the surrounding plumbing does not
change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal table schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_status", T.StringType(), False),
    ]
)


def attach_fake_payloads(docs: DataFrame) -> DataFrame:
    """Manufacture a multimodal table from the documents table: the text
    bytes stand in for an encoded media payload (deterministic), metadata
    derived from content. Real pipelines read payloads from object-store
    parquet/binaryFile sources with identical schema."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded by the
    content digest, so results are stable across partitions/runs."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big", signed=False)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_payload(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: the real image/audio decode (PIL / torchaudio / ffmpeg) is not
    available in this container."""
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass fake=True for the deterministic stand-in decoder"
        )
    return _fake_decode(payload)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas: one Python worker
    per partition, pandas batches in/out — the per-row cost is the decode,
    not serialization. Errors are captured per-row into decode_status
    (never fail the stage for one corrupt payload — DQ-report them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    feat = decode_payload(bytes(payload), fake=fake)
                    out.append(
                        (media_id, len(payload), feat.tolist(), "ok")
                    )
                except Exception as exc:  # corrupt payload → report row
                    out.append((media_id, len(payload or b""), [0.0] * FEATURE_DIM,
                                f"error: {type(exc).__name__}"))
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "feature", "decode_status"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode sample timestamps
    from duration metadata (JVM-side sequence/explode — the decode of each
    frame would then be an extract_features pass over (media_id, frame_ts))."""
    video = media.filter(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(F.col("duration_ms") - 1, F.lit(0).cast("long")),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
