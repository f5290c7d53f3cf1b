"""Real multimodal decode (X7): stdlib PNG/WAV codecs + the Spark
extract_features path running with fake=False on real payloads."""

from __future__ import annotations

import numpy as np
import pytest

from enterprise_data_quality_platform_spark.multimodal import (
    FEATURE_DIM,
    decode_payload,
    extract_features,
    png_decode,
    png_encode,
    png_features,
    sniff_format,
    wav_decode,
    wav_encode,
    wav_features,
)
from enterprise_data_quality_platform_spark.multimodal.codecs import _paeth


def _img(h, w, c, seed=7):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    img = _img(13, 17, channels)
    decoded = png_decode(png_encode(img))
    expect = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(decoded, expect)


def test_png_decode_all_filter_types():
    """Forward-filter scanlines with every PNG filter type (0-4) and check
    the decoder unfilters each back to the original pixels."""
    import struct
    import zlib

    from enterprise_data_quality_platform_spark.multimodal.codecs import PNG_SIG

    img = _img(5, 9, 3, seed=3)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        ftype = y % 5
        filt = np.zeros(stride, dtype=np.int16)
        for i in range(stride):
            left = int(cur[i - c]) if i >= c else 0
            up = int(prev[i])
            ul = int(prev[i - c]) if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, ul)
            filt[i] = (int(cur[i]) - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(payload), img)


def test_png_palette():
    """Color type 3: palette indices expand through PLTE to RGB."""
    import struct
    import zlib

    from enterprise_data_quality_platform_spark.multimodal.codecs import PNG_SIG

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(payload), palette[idx])


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):
        png_decode(b"JFIF....")


def test_wav_roundtrip():
    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    decoded, got_rate = wav_decode(wav_encode(sig, sample_rate=rate))
    assert got_rate == rate
    assert decoded.shape == (rate, 1)
    assert np.allclose(decoded[:, 0], sig, atol=2 / 32768)


def test_wav_stereo():
    rate = 4000
    sig = np.stack(
        [np.linspace(-0.9, 0.9, 100), np.linspace(0.9, -0.9, 100)], axis=1
    )
    decoded, got_rate = wav_decode(wav_encode(sig, sample_rate=rate))
    assert got_rate == rate and decoded.shape == (100, 2)
    assert np.allclose(decoded, sig, atol=2 / 32768)


def test_feature_vectors_fixed_dim_and_deterministic():
    png = png_encode(_img(20, 30, 3))
    wav = wav_encode(np.sin(np.arange(1000) / 10), sample_rate=16000)
    for payload, fn in [(png, png_features), (wav, wav_features)]:
        a, b = fn(payload), fn(payload)
        assert a.shape == (FEATURE_DIM,) and a.dtype == np.float32
        assert np.array_equal(a, b)
    # geometry lands in the first slots
    pf = png_features(png)
    assert (pf[0], pf[1], pf[2]) == (30.0, 20.0, 3.0)
    wf = wav_features(wav)
    assert wf[0] == 16.0  # kHz


def test_sniff_and_decode_payload_routing():
    png = png_encode(_img(4, 4, 1))
    wav = wav_encode(np.zeros(10))
    assert sniff_format(png) == "png"
    assert sniff_format(wav) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"  # jpeg.py decodes
    assert sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"  # mp4.py routes
    assert sniff_format(b"\x00" * 16) is None  # unknown container
    assert np.array_equal(decode_payload(png), png_features(png))
    assert np.array_equal(decode_payload(wav), wav_features(wav))
    # an ftyp header with no sample tables is corrupt, not unsupported
    with pytest.raises(ValueError):
        decode_payload(b"\x00\x00\x00\x18ftypmp42")
    # a truly unknown container stays the honest NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00" * 16)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(h, w, c, seed):
        """Property: every uint8 image round-trips bit-exactly through the
        pure-stdlib PNG encoder/decoder for any geometry and channel count."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 400),
        ch=st.integers(1, 2),
        rate=st.sampled_from([4000, 8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_property(n, ch, rate, seed):
        """Property: float samples round-trip through PCM WAV within one
        quantization step; rate and shape preserved."""
        rng = np.random.default_rng(seed)
        sig = rng.uniform(-0.999, 0.999, size=(n, ch))
        out, got_rate = wav_decode(wav_encode(sig, sample_rate=rate))
        assert got_rate == rate and out.shape == (n, ch)
        assert np.allclose(out, sig, atol=2 / 32768)


def test_multimodal_decode_real_query_all_ok(spark):
    """The registered fake=False query decodes every generated payload:
    exactly one 'ok' row per media type, counts covering all documents."""
    from enterprise_data_quality_platform_spark.catalog import table
    from enterprise_data_quality_platform_spark.queries.multimodal_ops import (
        multimodal_decode_real,
    )

    from conftest import SF_SMALL

    rows = multimodal_decode_real(spark, SF_SMALL).collect()
    assert [(r.media_type, r.decode_status) for r in rows] == [
        ("audio", "ok"),
        ("image", "ok"),
        ("video", "ok"),
    ]
    n_docs = table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_media for r in rows) == n_docs


def test_extract_features_real_decoders(spark):
    """End-to-end Spark path with fake=False: PNG and WAV rows decode for
    real (values equal the local decoder), unsupported formats become
    error rows instead of failing the stage."""
    from enterprise_data_quality_platform_spark.multimodal.jpeg import (
        jpeg_encode,
        jpeg_features,
    )

    png = png_encode(_img(8, 8, 3))
    wav = wav_encode(np.sin(np.arange(500) / 5), sample_rate=8000)
    jpg = jpeg_encode(_img(16, 24, 3), quality=90)
    rows = [
        (1, bytearray(png), "image", "image/png", 8, 8, 0),
        (2, bytearray(wav), "audio", "audio/wav", 0, 0, 62),
        (3, bytearray(jpg), "image", "image/jpeg", 24, 16, 0),
        (4, bytearray(b"\x00" * 24), "video", "video/raw", 2, 2, 0),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, mime string, "
        "width int, height int, duration_ms long",
    )
    out = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert out[1].decode_status == "ok"
    assert np.allclose(out[1].feature, png_features(png))
    assert out[2].decode_status == "ok"
    assert np.allclose(out[2].feature, wav_features(wav))
    assert out[3].decode_status == "ok"
    assert np.allclose(out[3].feature, jpeg_features(jpg))
    assert out[4].decode_status == "error: NotImplementedError"
