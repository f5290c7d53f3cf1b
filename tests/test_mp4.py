"""MJPEG-in-MP4 codec (multimodal/mp4.py): ISO-BMFF box walk, sample
reconstruction from stsc/stsz/stco, fps from mdhd+stts, feature parity
with the AVI wrapper, and the honest NotImplementedError boundary for
inter-frame sample formats (avc1)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from enterprise_data_quality_platform_spark.multimodal.mp4 import (
    mp4_decode,
    mp4_encode,
    mp4_features,
)


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return ((y[:, None] + x[None, :]) / 2).astype(np.uint8)


def test_mp4_roundtrip_frames_and_fps():
    frames = [_gradient(16, 24), _gradient(16, 24)[::-1].copy(), _gradient(16, 24)]
    payload = mp4_encode(frames, fps=12, quality=92)
    assert payload[4:8] == b"ftyp"
    got, fps = mp4_decode(payload)
    assert len(got) == 3 and abs(fps - 12.0) < 0.2
    for orig, dec in zip(frames, got):
        assert dec.shape == (16, 24, 1)
        assert np.abs(dec[:, :, 0].astype(int) - orig.astype(int)).mean() < 3


def test_mp4_rgb_and_single_frame():
    rgb = np.stack([_gradient(16, 16)] * 3, axis=2)
    got, _ = mp4_decode(mp4_encode([rgb], fps=1, quality=90))
    assert len(got) == 1 and got[0].shape == (16, 16, 3)


def test_mp4_features_match_avi_for_same_frames():
    """Downstream must be container-agnostic: identical frames wrapped in
    AVI and MP4 reduce to the SAME feature vector (shared JPEG bytes,
    shared reduction)."""
    from enterprise_data_quality_platform_spark.multimodal.avi import (
        avi_encode,
        avi_features,
    )

    frames = [np.roll(_gradient(16, 16), k * 37) for k in range(3)]
    f_mp4 = mp4_features(mp4_encode(frames, fps=10, quality=90))
    f_avi = avi_features(avi_encode(frames, fps=10, quality=90))
    assert f_mp4.shape == (16,)
    assert np.array_equal(f_mp4, f_avi)
    assert f_mp4[2] == 3.0 and abs(f_mp4[3] - 10.0) < 0.2


def test_mp4_routing_via_decode_payload():
    from enterprise_data_quality_platform_spark.multimodal.codecs import (
        sniff_format,
    )
    from enterprise_data_quality_platform_spark.multimodal.pipeline import (
        decode_payload,
    )

    payload = mp4_encode([_gradient(16, 16)] * 2, fps=5)
    assert sniff_format(payload) == "mp4"
    assert np.allclose(decode_payload(payload, fake=False), mp4_features(payload))


def test_mp4_avc1_raises_not_implemented():
    """An H.264 track is sniffed as mp4 but must fail with
    NotImplementedError (per-row 'error:' status upstream), not decode
    garbage: rewrite the stsd sample-entry tag of a valid file to avc1."""
    payload = bytearray(mp4_encode([_gradient(16, 16)], fps=1))
    idx = payload.find(b"jpeg", 12)  # first occurrence is the stsd entry tag
    assert idx > 0
    payload[idx : idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        mp4_decode(bytes(payload))


def test_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        mp4_decode(b"not an mp4 at all, no ftyp")
    # ftyp present but no sample tables
    hollow = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    with pytest.raises(ValueError):
        mp4_decode(hollow)


def test_mp4_multi_chunk_stco():
    """Hand-build a two-chunk layout (stsc run splits the samples 2+1)
    to pin the chunk-offset reconstruction the single-chunk encoder
    doesn't exercise."""
    frames = [_gradient(16, 16), _gradient(16, 16)[::-1].copy(),
              np.roll(_gradient(16, 16), 37)]
    single = mp4_encode(frames, fps=10, quality=90)
    # decode sizes of the three samples from the single-chunk file
    got, _ = mp4_decode(single)
    from enterprise_data_quality_platform_spark.multimodal.jpeg import (
        jpeg_encode,
    )

    payloads = [jpeg_encode(f, quality=90) for f in frames]

    # splice: rebuild mdat with a 4-byte gap between chunk 1 (2 samples)
    # and chunk 2 (1 sample); point stco at both chunks
    from enterprise_data_quality_platform_spark.multimodal import mp4 as m

    ftyp = m._box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    gap = b"\xde\xad\xbe\xef"
    mdat_body = payloads[0] + payloads[1] + gap + payloads[2]
    mdat = m._box(b"mdat", mdat_body)
    off1 = len(ftyp) + 8
    off2 = off1 + len(payloads[0]) + len(payloads[1]) + len(gap)

    stsd_entry = m._box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1) + struct.pack(">HH", 0, 0)
        + b"\x00" * 12 + struct.pack(">HH", 16, 16)
        + struct.pack(">II", 0x00480000, 0x00480000) + struct.pack(">I", 0)
        + struct.pack(">H", 1) + bytes([5]) + b"mjpeg" + b"\x00" * 26
        + struct.pack(">Hh", 24, -1),
    )
    stsd = m._full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = m._full(b"stts", 0, 0, struct.pack(">III", 1, 3, 9000))
    stsc = m._full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 1, 1),
    )
    stsz = m._full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 3)
        + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = m._full(b"stco", 0, 0, struct.pack(">III", 2, off1, off2))
    mdhd = m._full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 90000, 27000, 0x55C4, 0)
    )
    hdlr = m._full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    stbl = m._box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = m._box(b"minf", m._full(b"vmhd", 0, 1, b"\x00" * 8) + stbl)
    mdia = m._box(b"mdia", mdhd + hdlr + minf)
    trak = m._box(b"trak", m._full(b"tkhd", 0, 7, b"\x00" * 80) + mdia)
    moov = m._box(b"moov", m._box(b"mvhd", b"\x00" * 100) + trak)
    two_chunk = ftyp + mdat + moov

    dec, fps = mp4_decode(two_chunk)
    assert len(dec) == 3 and abs(fps - 10.0) < 0.2
    for a, b in zip(got, dec):
        assert np.array_equal(a, b)
