"""MJPEG-in-MP4 video codec: pure stdlib ISO-BMFF (MP4) container walk +
the numpy JPEG codec — the second real video container next to AVI.

An MP4 file is a tree of length-prefixed boxes (ISO/IEC 14496-12):
``ftyp`` (brand), ``mdat`` (raw sample bytes) and ``moov`` holding the
sample tables — ``stsd`` (codec: a ``jpeg`` VisualSampleEntry here, the
Motion-JPEG sample format), ``stts`` (durations → fps), ``stsc``
(sample→chunk runs), ``stsz`` (sample sizes) and ``stco``/``co64``
(chunk file offsets). Decoding = reconstructing each sample's byte range
from those four tables and running the baseline JPEG decoder on it.

Everything here is from the public ISO base-media spec; the reference
pipeline has no media path to mirror. Inter-frame codecs (``avc1``/H.264
sample entries) stay out of scope honestly — the decoder raises
NotImplementedError for them, which the Arrow plumbing surfaces as a
per-row error status rather than a stage failure."""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode

#: stsd sample-entry formats whose samples are complete baseline JPEGs.
_MJPEG_FORMATS = {b"jpeg", b"mjpa", b"MJPG"}

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, bytes([version]) + flags.to_bytes(3, "big") + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def mp4_encode(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode uint8 frames ((H, W) gray or (H, W, 3) RGB, all same size)
    as an MJPEG MP4 (one video track, ``jpeg`` sample entries, all samples
    in a single contiguous chunk)."""
    if not frames:
        raise ValueError("mp4_encode needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [jpeg_encode(f, quality=quality) for f in frames]
    n = len(payloads)

    timescale = 90000
    delta = timescale // max(fps, 1)
    duration = n * delta
    movie_timescale = 1000
    movie_duration = (duration * movie_timescale) // timescale

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(payloads))
    first_sample_offset = len(ftyp) + 8  # mdat header is 8 bytes

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_timescale, movie_duration)
        + struct.pack(">iHHII", 0x00010000, 0x0100, 0, 0, 0)
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 0x7,
        struct.pack(">IIIII", 0, 0, 1, 0, movie_duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    # VisualSampleEntry('jpeg') — ISO 14496-12 §12.1.3
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)          # data_reference_index
        + struct.pack(">HH", 0, 0)      # pre_defined, reserved
        + b"\x00" * 12                  # pre_defined[3]
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)          # frame_count
        + bytes([5]) + b"mjpeg" + b"\x00" * 26  # compressorname (32 bytes)
        + struct.pack(">Hh", 24, -1),   # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_offset))
    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(b"dinf", dref)
        + stbl,
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, pos: int, end: int, found: dict) -> None:
    """Collect the sample-table boxes of the FIRST video track."""
    while pos + 8 <= end:
        size, tag = struct.unpack(">I4s", data[pos : pos + 8])
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", data[body : body + 8])[0]
            body += 8
        elif size == 0:  # to end of enclosing box
            size = end - pos
        box_end = min(pos + size, end)
        if tag in _CONTAINERS:
            # one video track only: don't descend into further traks once
            # the first track's tables are complete
            if not (tag == b"trak" and b"stsz" in found):
                _walk(data, body, box_end, found)
        elif tag in (b"mdhd", b"stsd", b"stts", b"stsc", b"stsz", b"stco",
                     b"co64", b"hdlr") and tag not in found:
            found[tag] = data[body:box_end]
        pos = box_end if size > 0 else end


def mp4_decode(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Decode an MJPEG MP4 to (frames, fps).

    Reconstructs per-sample byte ranges from stsc/stsz/stco(co64), checks
    the stsd sample-entry format is an intra-frame JPEG one, and decodes
    each sample with the baseline JPEG decoder. fps comes from the mdhd
    timescale over the average stts delta."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (ftyp box missing)")
    found: dict = {}
    _walk(payload, 0, len(payload), found)
    for req in (b"stsd", b"stsz", b"stsc"):
        if req not in found:
            raise ValueError(f"MP4 missing {req.decode()} sample table")

    stsd = found[b"stsd"]
    fmt = stsd[4 + 8 : 4 + 12]  # entry_count u32, then first entry size+tag
    if fmt not in _MJPEG_FORMATS:
        raise NotImplementedError(
            f"MP4 sample format {fmt!r} needs an inter-frame decoder "
            "(ffmpeg); only Motion-JPEG ('jpeg'/'mjpa') decodes natively"
        )

    stsz = found[b"stsz"]
    uniform, count = struct.unpack(">II", stsz[4:12])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(f">{count}I", stsz[12 : 12 + 4 * count]))

    if b"stco" in found:
        sc = found[b"stco"]
        (n_chunks,) = struct.unpack(">I", sc[4:8])
        offsets = list(struct.unpack(f">{n_chunks}I", sc[8 : 8 + 4 * n_chunks]))
    elif b"co64" in found:
        sc = found[b"co64"]
        (n_chunks,) = struct.unpack(">I", sc[4:8])
        offsets = list(struct.unpack(f">{n_chunks}Q", sc[8 : 8 + 8 * n_chunks]))
    else:
        raise ValueError("MP4 missing stco/co64 chunk offsets")

    stsc = found[b"stsc"]
    (n_runs,) = struct.unpack(">I", stsc[4:8])
    runs = [
        struct.unpack(">III", stsc[8 + 12 * i : 20 + 12 * i])
        for i in range(n_runs)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)

    # per-chunk sample counts from the stsc runs
    per_chunk = []
    for i, (first, spc, _d) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(offsets)
        per_chunk.extend([spc] * (last - first + 1))

    frames: list[np.ndarray] = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        pos = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            frames.append(jpeg_decode(payload[pos : pos + sizes[si]]))
            pos += sizes[si]
            si += 1
    if not frames:
        raise ValueError("no MJPEG samples found in MP4")

    fps = 0.0
    if b"mdhd" in found and b"stts" in found:
        timescale = struct.unpack(">I", found[b"mdhd"][12:16])[0]
        stts = found[b"stts"]
        (n_ent,) = struct.unpack(">I", stts[4:8])
        tot_n = tot_dur = 0
        for i in range(n_ent):
            cnt, delta = struct.unpack(">II", stts[8 + 8 * i : 16 + 8 * i])
            tot_n += cnt
            tot_dur += cnt * delta
        if tot_dur:
            fps = timescale * tot_n / tot_dur
    return frames, fps


def mp4_features(payload: bytes, dim: int | None = None) -> np.ndarray:
    """Decode + reduce to the same fixed feature vector as ``avi_features``
    (geometry, frame count, fps, luma stats, motion) — container-agnostic
    downstream: phash/near-dup/sampling never see which wrapper the frames
    came in."""
    from .avi import mjpeg_video_features

    frames, fps = mp4_decode(payload)
    return mjpeg_video_features(frames, fps, dim)
