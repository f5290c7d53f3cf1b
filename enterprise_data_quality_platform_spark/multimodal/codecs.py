"""Real stdlib media codecs for the multimodal pipeline (SURVEY.md §2.6 X7).

The container has no PIL/ffmpeg/torchaudio, but two real formats ARE fully
decodable with the standard library + numpy:

- **PNG**: signature + chunk walk (``struct``), IDAT inflate (``zlib``),
  scanline unfiltering (the five PNG filter types), pixel statistics.
  A complete, spec-correct decode for non-interlaced 8-bit images — not a
  header sniff.
- **WAV**: ``wave`` header parse + PCM ``numpy.frombuffer`` decode, energy
  and spectral features via numpy FFT.

Each decoder reduces the media to the engine's fixed ``FEATURE_DIM``-wide
float vector, so downstream similarity/dedup operators (similarity/,
dedup/) consume decoded media exactly like text embeddings. Encoders for
both formats are included so tests can generate real payloads from scratch.

Reference parity note: the reference pipeline has no media path at all
(``/root/reference`` is Airflow/dbt/BigQuery); X7 exists for the
training-data use case — treat media as binary + metadata, decode behind
an Arrow-batched boundary (``pipeline.extract_features``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FEATURE_DIM = 16

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (palette handled via PLTE expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) grayscale or (H, W, C) uint8 array as a PNG
    (filter 0, one IDAT). Pure stdlib — exists so tests can build real
    payloads without PIL."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Full PNG decode → (H, W, C) uint8. Supports 8-bit depth, color types
    0/2/3/4/6, non-interlaced (the overwhelmingly common case; Adam7 and
    16-bit raise ValueError rather than mis-decode)."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, plte = len(PNG_SIG), [], None
    w = h = depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + data + crc
    if w is None or not idat:
        raise ValueError("not a PNG: missing IHDR/IDAT")
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG: depth={depth} interlace={interlace}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")

    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed size")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for i in range(c, stride):
                cur[i] = (cur[i] + cur[i - c]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                cur[i] = (cur[i] + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                ul = int(prev[i - c]) if i >= c else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, c)
    if color_type == 3:  # palette → RGB
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        img = plte[img[:, :, 0]]
    return img


def png_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Decode + reduce to the fixed feature vector: geometry, channel
    stats, and an 8-bin grayscale histogram (density) — deterministic,
    resolution-independent."""
    img = png_decode(payload)
    h, w, c = img.shape
    gray = img.astype(np.float32).mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 255.0))
    hist = hist / max(gray.size, 1)
    feat = np.array(
        [
            float(w),
            float(h),
            float(c),
            float(gray.mean()),
            float(gray.std()),
            float(img.min()),
            float(img.max()),
            float(np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0),
            *hist.tolist(),
        ],
        dtype=np.float32,
    )
    return _fit(feat, dim)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, sampwidth: int = 2
) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (N, C)) as PCM WAV."""
    import io
    import wave

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    scale = float(2 ** (8 * sampwidth - 1) - 1)
    pcm = np.clip(np.round(arr * scale), -scale - 1, scale)
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}[sampwidth]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(sampwidth)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.astype(dtype).tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV decode → (float samples in [-1, 1] shaped (N, C), rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw not in (1, 2, 4):
        raise ValueError(f"unsupported WAV sample width {sw}")
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}[sw]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    x /= float(2 ** (8 * sw - 1))
    return x.reshape(-1, nch), rate


def wav_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Decode + reduce: rate/shape, energy (RMS, peak), zero-crossing rate,
    and an 8-band log-spectral profile over the mono mix."""
    x, rate = wav_decode(payload)
    mono = x.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    peak = float(np.abs(mono).max()) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(mono))
        bands = np.array_split(spec, 8)
        band_e = np.array(
            [float(np.log1p(np.mean(b**2))) if len(b) else 0.0 for b in bands],
            dtype=np.float32,
        )
    else:
        band_e = np.zeros(8, dtype=np.float32)
    feat = np.array(
        [
            float(rate) / 1000.0,
            float(x.shape[1]),
            float(n) / max(rate, 1),
            rms,
            peak,
            zcr,
            float(mono.mean()) if n else 0.0,
            float(mono.std()) if n else 0.0,
            *band_e.tolist(),
        ],
        dtype=np.float32,
    )
    return _fit(feat, dim)


# ---------------------------------------------------------------------------


def _fit(feat: np.ndarray, dim: int) -> np.ndarray:
    if len(feat) >= dim:
        return feat[:dim].astype(np.float32)
    return np.pad(feat, (0, dim - len(feat))).astype(np.float32)


def sniff_format(payload: bytes) -> str | None:
    """Identify a decodable container by magic bytes."""
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return None
