"""MJPEG-in-AVI video codec: pure stdlib RIFF container + the numpy JPEG
codec — completes X7's video path with a real, public-spec format.

An AVI file is a RIFF tree: ``RIFF('AVI ')`` containing ``LIST('hdrl')``
(main ``avih`` header + one ``LIST('strl')`` per stream) and
``LIST('movi')`` whose ``00dc`` chunks carry one compressed frame each —
for MJPEG, each chunk is a complete baseline JPEG. Every structure here
is from the public AVI/RIFF spec (msdn AVIMAINHEADER et al.); the
reference pipeline has no media path to mirror.

MP4/H.264 stays out of scope honestly (inter-frame codecs need a real
decoder stack); MJPEG is the intra-only format actually used by cameras
and capture rigs, and exercises the engine's full video surface: duration
metadata, frame sampling (``pipeline.frame_sample``), per-frame decode,
temporal feature aggregation — all behind the same Arrow-batched
``extract_features`` boundary."""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode


def avi_encode(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode uint8 frames ((H, W) gray or (H, W, 3) RGB, all same size)
    as an MJPEG AVI."""
    if not frames:
        raise ValueError("avi_encode needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [jpeg_encode(f, quality=quality) for f in frames]

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(tag: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", tag + data)

    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        # flags=0: no idx1 chunk is written, so AVIF_HASINDEX (0x10) must
        # stay off or strict readers would look for an index we lack.
        usec_per_frame, max_bytes * fps, 0, 0,
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0, 0, 1, fps, 0, len(payloads), max_bytes, 0xFFFFFFFF, 0,
            0, 0, w, h,
        )
    )
    # BITMAPINFOHEADER
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Decode an MJPEG AVI to (frames, fps). Walks the RIFF tree
    tolerantly: any ``00dc``/``00db`` chunk whose payload starts with a
    JPEG SOI is a frame; fps comes from ``avih``'s usec-per-frame."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' signature missing)")
    frames: list[np.ndarray] = []
    usec_per_frame = 0

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal usec_per_frame
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if tag in (b"RIFF", b"LIST"):
                walk(data, body_start + 4, body_end)  # skip the list type
            elif tag == b"avih" and size >= 4:
                usec_per_frame = struct.unpack(
                    "<I", data[body_start : body_start + 4]
                )[0]
            elif tag in (b"00dc", b"00db") and data[
                body_start : body_start + 2
            ] == b"\xff\xd8":
                frames.append(jpeg_decode(data[body_start:body_end]))
            pos = body_end + (size % 2)  # chunks are word-aligned

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("no MJPEG frames found in AVI")
    fps = 1_000_000 / usec_per_frame if usec_per_frame else 0.0
    return frames, fps


def avi_features(payload: bytes, dim: int | None = None) -> np.ndarray:
    """Decode + reduce to the fixed feature vector: geometry, frame count,
    fps, per-frame luma stats, and mean inter-frame absolute difference
    (the motion signal frame-dedup and scene-cut detection key on)."""
    frames, fps = avi_decode(payload)
    return mjpeg_video_features(frames, fps, dim)


def mjpeg_video_features(
    frames: list[np.ndarray], fps: float, dim: int | None = None
) -> np.ndarray:
    """Container-agnostic video feature reduction shared by the AVI and
    MP4 wrappers: geometry, frame count, fps, per-frame luma stats and
    mean inter-frame absolute difference (motion)."""
    from .codecs import FEATURE_DIM, _fit

    grays = [f.astype(np.float32).mean(axis=2) for f in frames]
    h, w = grays[0].shape
    means = np.array([g.mean() for g in grays])
    motion = (
        float(
            np.mean(
                [np.abs(grays[i + 1] - grays[i]).mean() for i in range(len(grays) - 1)]
            )
        )
        if len(grays) > 1
        else 0.0
    )
    feat = np.array(
        [
            float(w),
            float(h),
            float(len(frames)),
            float(fps),
            float(means.mean()),
            float(means.std()),
            float(min(g.min() for g in grays)),
            float(max(g.max() for g in grays)),
            motion,
        ],
        dtype=np.float32,
    )
    return _fit(feat, dim or FEATURE_DIM)
