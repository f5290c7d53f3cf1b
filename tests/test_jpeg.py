"""Baseline JPEG codec (multimodal/jpeg.py): spec-correct encode/decode
round trips, subsampling, marker handling, and the pipeline routing that
turns X7's former NotImplementedError branch into a real decode."""

from __future__ import annotations

import numpy as np
import pytest

from enterprise_data_quality_platform_spark.multimodal.jpeg import (
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
    _canonical_codes,
    jpeg_decode,
    jpeg_encode,
    jpeg_features,
)


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    return ((y[:, None] + x[None, :]) / 2).astype(np.uint8)


def test_annex_k_tables_are_valid_prefix_codes():
    """bits/huffval consistency: canonical assignment yields a prefix-free
    code with the declared per-length counts (a typo in the public tables
    would break every third-party decode)."""
    for bits, huffval in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
        assert sum(bits) == len(huffval)
        codes = _canonical_codes(bits, huffval)
        assert len(codes) == len(huffval)
        seen = set()
        for code, length in codes.values():
            assert code < (1 << length)
            # prefix-freeness: no code is a prefix of another
            for c2, l2 in seen:
                if l2 > length:
                    assert (c2 >> (l2 - length)) != code
                elif length > l2:
                    assert (code >> (length - l2)) != c2
            seen.add((code, length))


def test_grayscale_roundtrip_high_quality():
    img = _gradient(32, 48)
    dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert dec.shape == (32, 48, 1)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_rgb_roundtrip_444_and_420():
    g = _gradient(24, 40)
    rgb = np.stack([g, g[::-1], np.full_like(g, 128)], axis=2)
    d444 = jpeg_decode(jpeg_encode(rgb, quality=92, subsample=False))
    d420 = jpeg_decode(jpeg_encode(rgb, quality=92, subsample=True))
    assert d444.shape == d420.shape == (24, 40, 3)
    assert np.abs(d444.astype(int) - rgb.astype(int)).mean() < 2.0
    # 4:2:0 loses chroma resolution but must stay visually close
    assert np.abs(d420.astype(int) - rgb.astype(int)).mean() < 6.0


def test_noise_image_roundtrip_is_lossy_but_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95))[:, :, 0]
    # worst case for DCT coding; still bounded at q95
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 12


def test_non_mcu_multiple_dimensions():
    for h, w in ((13, 17), (8, 9), (1, 1), (7, 32)):
        img = _gradient(h, w)
        dec = jpeg_decode(jpeg_encode(img, quality=90))
        assert dec.shape == (h, w, 1)
    g = _gradient(11, 14)
    rgb = np.stack([g, g, g], axis=2)
    assert jpeg_decode(jpeg_encode(rgb, subsample=True)).shape == (11, 14, 3)


def test_quality_monotonic_in_size_and_error():
    img = _gradient(32, 32)
    lo, hi = jpeg_encode(img, quality=20), jpeg_encode(img, quality=95)
    assert len(lo) < len(hi)
    err_lo = np.abs(jpeg_decode(lo)[:, :, 0].astype(int) - img.astype(int)).mean()
    err_hi = np.abs(jpeg_decode(hi)[:, :, 0].astype(int) - img.astype(int)).mean()
    assert err_hi <= err_lo


def test_deterministic_bytes():
    img = _gradient(16, 16)
    assert jpeg_encode(img, quality=80) == jpeg_encode(img, quality=80)


def test_rejects_progressive_and_garbage():
    img = _gradient(16, 16)
    enc = bytearray(jpeg_encode(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(enc))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not a jpeg")
    with pytest.raises(Exception):
        jpeg_decode(jpeg_encode(img)[:40])  # truncated mid-stream


def test_features_shape_and_geometry():
    img = _gradient(20, 30)
    feat = jpeg_features(jpeg_encode(img, quality=90))
    assert feat.shape == (16,) and feat.dtype == np.float32
    assert feat[0] == 30.0 and feat[1] == 20.0 and feat[2] == 1.0


def test_decode_payload_routes_jpeg():
    from enterprise_data_quality_platform_spark.multimodal.pipeline import (
        decode_payload,
    )

    img = _gradient(16, 16)
    payload = jpeg_encode(img, quality=90)
    feat = decode_payload(payload, fake=False)
    assert np.allclose(feat, jpeg_features(payload))


def test_restart_markers_roundtrip():
    """DRI/RSTn: byte-aligned restart boundaries with DC-predictor resets
    decode identically to the marker-free stream (camera-JPEG layout)."""
    img = _gradient(32, 48)
    plain = jpeg_decode(jpeg_encode(img, quality=90))
    with_rst = jpeg_encode(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + n]) in with_rst for n in range(8))
    dec = jpeg_decode(with_rst)
    assert np.array_equal(dec, plain)
    # color + subsampling + restarts together
    rgb = np.stack([img, img[::-1], img], axis=2)
    a = jpeg_decode(jpeg_encode(rgb, quality=88, subsample=True))
    b = jpeg_decode(jpeg_encode(rgb, quality=88, subsample=True, restart_interval=1))
    assert np.array_equal(a, b)


# ------------------------------------------------------------ MJPEG AVI


def test_avi_roundtrip_frames_and_fps():
    from enterprise_data_quality_platform_spark.multimodal.avi import (
        avi_decode,
        avi_encode,
    )

    frames = [_gradient(16, 24), _gradient(16, 24)[::-1].copy(), _gradient(16, 24)]
    payload = avi_encode(frames, fps=12, quality=92)
    got, fps = avi_decode(payload)
    assert len(got) == 3 and abs(fps - 12.0) < 0.2
    for orig, dec in zip(frames, got):
        assert dec.shape == (16, 24, 1)
        assert np.abs(dec[:, :, 0].astype(int) - orig.astype(int)).mean() < 3


def test_avi_features_and_routing():
    from enterprise_data_quality_platform_spark.multimodal.avi import (
        avi_encode,
        avi_features,
    )
    from enterprise_data_quality_platform_spark.multimodal.codecs import (
        sniff_format,
    )
    from enterprise_data_quality_platform_spark.multimodal.pipeline import (
        decode_payload,
    )

    static = avi_encode([_gradient(16, 16)] * 3, fps=10)
    moving = avi_encode(
        [np.roll(_gradient(16, 16), k * 37) for k in range(3)], fps=10
    )
    assert sniff_format(static) == "avi"
    f_static, f_moving = avi_features(static), avi_features(moving)
    assert f_static.shape == (16,)
    assert f_static[2] == 3.0 and abs(f_static[3] - 10.0) < 0.2  # frames, fps
    assert f_moving[8] > f_static[8]  # motion signal separates them
    assert np.allclose(decode_payload(moving, fake=False), f_moving)


def test_avi_rejects_garbage():
    from enterprise_data_quality_platform_spark.multimodal.avi import avi_decode

    with pytest.raises(ValueError):
        avi_decode(b"RIFF\x00\x00\x00\x00WAVEnot-a-video")
    with pytest.raises(ValueError):
        avi_decode(b"not riff at all")
