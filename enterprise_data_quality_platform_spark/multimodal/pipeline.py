"""Multimodal column pipeline (SURVEY.md §2.6 X7).

Pattern: media (image/audio/video) are opaque ``binary`` payload columns
with typed metadata; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched pandas iterators via ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

Decode is REAL for stdlib-decodable containers: PNG (full zlib inflate +
scanline unfilter + pixel statistics) and PCM WAV (sample decode + energy/
spectral features) — see ``codecs.py``. Formats that need native libraries
(JPEG, MP4, ...) raise NotImplementedError from ``decode_payload``; a
deployment with PIL/ffmpeg swaps that branch only — the Arrow plumbing
does not change. A deterministic fake decoder (seeded by content hash)
remains for tests that need arbitrary payloads.
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


def attach_real_payloads(docs: DataFrame) -> DataFrame:
    """Real-payload twin of ``attach_fake_payloads``: encode each document
    into an actually-decodable container — a 16×16 grayscale PNG
    (doc_id % 4 == 0 except the video slices), a baseline JPEG
    (doc_id % 4 == 2), a 3-frame MJPEG video as AVI (doc_id % 16 == 4)
    or MP4 (doc_id % 16 == 12), or an 8 kHz PCM WAV (odd) — built from
    the content digest via the pure-numpy codecs. Deterministic per
    document, Arrow-batched; gives the fake=False decode path real bytes
    for all four media types (and both video containers) at any scale."""
    from .avi import avi_encode
    from .codecs import png_encode, wav_encode
    from .jpeg import jpeg_encode
    from .mp4 import mp4_encode

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.sha256((text or "").encode("utf-8")).digest()
                buf = np.frombuffer((digest * 8)[:256], dtype=np.uint8)
                if doc_id % 8 == 4:
                    frames = [
                        np.roll(buf, k).reshape(16, 16) for k in range(3)
                    ]
                    if doc_id % 16 == 4:
                        payload = avi_encode(frames, fps=10, quality=90)
                        mime = "video/x-msvideo"
                    else:
                        payload = mp4_encode(frames, fps=10, quality=90)
                        mime = "video/mp4"
                    rows.append(
                        (doc_id, payload, "video", mime, 16, 16, 300)
                    )
                elif doc_id % 4 == 2:
                    payload = jpeg_encode(buf.reshape(16, 16), quality=90)
                    rows.append(
                        (doc_id, payload, "image", "image/jpeg", 16, 16, 0)
                    )
                elif doc_id % 2 == 0:
                    payload = png_encode(buf.reshape(16, 16))
                    rows.append(
                        (doc_id, payload, "image", "image/png", 16, 16, 0)
                    )
                else:
                    samples = (buf.astype(np.float32) - 127.5) / 128.0
                    payload = wav_encode(samples, sample_rate=8000)
                    rows.append(
                        (doc_id, payload, "audio", "audio/wav", None, None,
                         int(len(samples) * 1000 / 8000))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "payload", "media_type", "mime",
                    "width", "height", "duration_ms",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(encode, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded by the
    content digest, so results are stable across partitions/runs."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "big", signed=False)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_payload(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode a media payload to the fixed feature vector.

    Real path (``fake=False``): route by magic bytes to the pure-numpy
    codecs — full PNG decode (zlib inflate + scanline unfilter + pixel
    stats), PCM WAV decode (energy + spectral bands), baseline JPEG
    decode (Huffman entropy decode + dequant + IDCT + chroma upsample;
    ``jpeg.py``), and MJPEG video decode in BOTH container formats —
    RIFF/AVI (chunk walk; ``avi.py``) and ISO-BMFF/MP4 (box walk +
    sample tables; ``mp4.py``) — per-frame JPEG + motion features.
    Only inter-frame codecs (H.264/avc1 sample entries inside MP4)
    raise NotImplementedError — they need ffmpeg; in a real deployment
    that branch dispatches to it and the surrounding Arrow plumbing is
    unchanged.

    Fake path (``fake=True``): deterministic content-hash features, kept
    for tests that need payloads without a decodable container."""
    if fake:
        return _fake_decode(payload)
    from .codecs import png_features, sniff_format, wav_features

    fmt = sniff_format(payload)
    if fmt == "png":
        return png_features(payload)
    if fmt == "wav":
        return wav_features(payload)
    if fmt == "jpeg":
        from .jpeg import jpeg_features

        return jpeg_features(payload)
    if fmt == "avi":
        from .avi import avi_features

        return avi_features(payload)
    if fmt == "mp4":
        from .mp4 import mp4_features

        # MJPEG samples decode natively; avc1/H.264 sample entries raise
        # NotImplementedError from here (per-row error status upstream)
        return mp4_features(payload)
    raise NotImplementedError(
        "no stdlib codec for this payload format; PNG, JPEG, WAV, "
        "MJPEG-AVI and MJPEG-MP4 decode natively — inter-frame video "
        "codecs (H.264/H.265) need ffmpeg (not in this environment)"
    )


def extract_features(
    media: DataFrame,
    fake: bool = True,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas: one Python worker
    per partition, pandas batches in/out — the per-row cost is the decode,
    not serialization. Errors are captured per-row into decode_status
    (never fail the stage for one corrupt payload — DQ-report them).

    ``passthrough`` names input columns copied verbatim into the output —
    the way to keep metadata (media_type, mime) WITHOUT a join back to the
    media frame, which would re-run whatever produced the payloads (a
    mapInPandas source can't be column-pruned, so the join side pays the
    full encode again — measured 2× on the real-decode query)."""
    schema = T.StructType(
        list(FEATURE_SCHEMA.fields)
        + [media.schema[c] for c in passthrough]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, (media_id, payload) in enumerate(
                zip(pdf["media_id"], pdf["payload"])
            ):
                extra = tuple(pdf[c].iloc[i] for c in passthrough)
                try:
                    feat = decode_payload(bytes(payload), fake=fake)
                    out.append(
                        (media_id, len(payload), feat.tolist(), "ok") + extra
                    )
                except Exception as exc:  # corrupt payload → report row
                    out.append(
                        (media_id, len(payload or b""), [0.0] * FEATURE_DIM,
                         f"error: {type(exc).__name__}") + extra
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_bytes", "feature", "decode_status"]
                + list(passthrough),
            )

    return media.mapInPandas(run, schema)


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
