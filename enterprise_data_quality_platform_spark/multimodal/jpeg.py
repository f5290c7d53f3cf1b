"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy + stdlib.

Completes the X7 real-decode matrix (PNG and WAV live in ``codecs.py``;
JPEG previously raised NotImplementedError from ``pipeline.decode_payload``).
This is a spec-correct *baseline sequential DCT* implementation:

- **Decoder**: marker walk (SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI), canonical
  Huffman decode of the entropy stream (byte-unstuffing, restart markers),
  DPCM DC + run-length AC, dequantize, inverse zigzag, 8x8 IDCT
  (orthonormal DCT-II matrix), chroma upsampling for subsampled scans,
  JFIF YCbCr -> RGB. Handles grayscale, 4:4:4 and 4:2:0/4:2:2 component
  layouts (sampling factors 1-2), images not multiple of the MCU size.
  Progressive (SOF2) and arithmetic coding are rejected with a clear error.
- **Encoder**: the matching baseline writer (Annex K quantization tables
  scaled by a libjpeg-style quality factor, Annex K Huffman tables emitted
  in DHT, optional 4:2:0 subsampling) so tests can build real JPEG
  payloads from scratch — the same reason ``png_encode`` exists.

Everything here derives from the public JPEG specification; the reference
pipeline (``/root/reference`` — Airflow/dbt/BigQuery) has no media path at
all, so there is no reference code to mirror. At engine level the decode
runs inside ``pipeline.extract_features``'s Arrow-batched mapInPandas, so
scale economics are unchanged: one Python worker per partition, per-row
cost is the decode itself.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (JPEG Annex K — public spec tables)
# ---------------------------------------------------------------------------

#: zigzag scan: index in scan order -> (row, col); d=r+c diagonals, odd
#: diagonals walk r ascending, even descending (T.81 figure 5)
_ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
)
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

#: Annex K.1 luminance / K.2 chrominance quantization tables (row-major)
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

#: Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II matrix: dct = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


# ---------------------------------------------------------------------------
# Huffman code plumbing
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-fill) and emit RSTn — T.81 restart boundary."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


class _BitReader:
    """Entropy-stream reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise EOFError("entropy stream truncated")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy stream")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def consume_restart(self) -> None:
        # reader sits right before FF Dn
        self.byte_align()
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` raw bits to the signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Bit-size category of a signed DPCM/AC value."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(
    block: np.ndarray,
    qt: np.ndarray,
    dc_pred: int,
    dc_codes: dict,
    ac_codes: dict,
    w: _BitWriter,
) -> int:
    coef = _D @ (block.astype(np.float64) - 128.0) @ _D.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q[_ZZ_ROWS, _ZZ_COLS]
    # DC: DPCM
    diff = int(zz[0]) - dc_pred
    size = _category(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC: run-length
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _blocks(plane: np.ndarray):
    """Pad a plane to 8-multiples by edge replication and yield 8x8 tiles
    in raster order together with the tile grid shape."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return padded


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as baseline JPEG.

    ``subsample=True`` writes 4:2:0 (2x2 luma per chroma sample) — the
    layout virtually every camera JPEG uses, so the decoder's upsampling
    path is exercised by our own artifacts. ``restart_interval=N`` writes
    DRI + RSTn markers every N MCUs (camera JPEGs use this for error
    resilience; exercises the decoder's restart resync)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("jpeg_encode takes (H,W) gray or (H,W,3) RGB")
    h, w = arr.shape[:2]
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    hv = (2, 2) if (subsample and not gray) else (1, 1)
    if subsample and not gray:
        # chroma: pad to even dims, then 2x2 box average
        for i in (1, 2):
            p = planes[i]
            p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            planes[i] = (
                p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
            ) / 4.0

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return (
            b"\xff\xdb"
            + struct.pack(">H", 67)
            + bytes([tid])
            + bytes(int(tbl[r, c]) for r, c in _ZIGZAG)
        )

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)

    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    sof += bytes([1, (hv[0] << 4) | hv[1], 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + sof

    def dht(tclass: int, tid: int, bits: list[int], huffval: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(huffval))
            + bytes([(tclass << 4) | tid])
            + bytes(bits)
            + bytes(huffval)
        )

    out += dht(0, 0, *_DC_LUMA) + dht(1, 0, *_AC_LUMA)
    if not gray:
        out += dht(0, 1, *_DC_CHROMA) + dht(1, 1, *_AC_CHROMA)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    sos += bytes([1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos

    writer = _BitWriter()
    hmax, vmax = hv
    y_pad = _blocks(planes[0])
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w
    # pad luma out to whole MCUs
    y_pad = np.pad(
        y_pad,
        ((0, mcus_y * mcu_h - y_pad.shape[0]), (0, mcus_x * mcu_w - y_pad.shape[1])),
        mode="edge",
    )
    chroma_pads = []
    if not gray:
        for i in (1, 2):
            p = _blocks(planes[i])
            p = np.pad(
                p,
                ((0, mcus_y * 8 - p.shape[0]), (0, mcus_x * 8 - p.shape[1])),
                mode="edge",
            )
            chroma_pads.append(p)
    preds = [0, 0, 0]
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.restart(rst_n)
                rst_n = (rst_n + 1) % 8
                preds = [0, 0, 0]
            mcu_count += 1
            for by in range(vmax):
                for bx in range(hmax):
                    r0 = my * mcu_h + by * 8
                    c0 = mx * mcu_w + bx * 8
                    preds[0] = _encode_block(
                        y_pad[r0 : r0 + 8, c0 : c0 + 8], qt_l, preds[0],
                        dc_l, ac_l, writer,
                    )
            if not gray:
                for ci, plane in enumerate(chroma_pads, start=1):
                    r0, c0 = my * 8, mx * 8
                    preds[ci] = _encode_block(
                        plane[r0 : r0 + 8, c0 : c0 + 8], qt_c, preds[ci],
                        dc_c, ac_c, writer,
                    )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H, W, C) uint8 (C = 1 grayscale, 3 RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    data = payload

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                n = 64 * (2 if pq else 1)
                vals = (
                    np.frombuffer(seg[i : i + n], dtype=">u2")
                    if pq
                    else np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                ).astype(np.int32)
                tbl = np.zeros((8, 8), dtype=np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qtables[tq] = tbl
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + nv])
                htables[(tclass, tid)] = _decode_table(bits, huffval)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hvb, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hvb >> 4, "v": hvb & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential DCT (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for si in range(ns):
                cs, tables = seg[1 + 2 * si], seg[2 + 2 * si]
                scan_sel.append((cs, tables >> 4, tables & 0xF))
            entropy_start = pos + seglen
            return _decode_scan(
                data, entropy_start, frame, scan_sel, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no scan found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_sel: list[tuple[int, int, int]],
    qtables: dict,
    htables: dict,
    restart_interval: int,
) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    mcus_y = (h + mcu_h - 1) // mcu_h
    mcus_x = (w + mcu_w - 1) // mcu_w

    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        c = by_id[cs]
        order.append((c, htables[(0, td)], htables[(1, ta)], qtables[c["tq"]]))

    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c, *_ in order
    ]
    preds = [0] * len(order)
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # the encoder byte-aligns (1-fill) before RSTn: drop any
                # leftover padding bits FIRST, then the marker must sit
                # right at the byte cursor (probing with read_bit would
                # consume a padding bit and desync the stream)
                reader.byte_align()
                if (
                    reader.pos + 1 < len(reader.data)
                    and reader.data[reader.pos] == 0xFF
                    and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 2
                preds = [0] * len(order)
            for idx, (c, dct, act, qt) in enumerate(order):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block, preds[idx] = _decode_block(
                            reader, dct, act, qt, preds[idx]
                        )
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[idx][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_count += 1

    # upsample subsampled components to full MCU-grid resolution
    full = []
    for idx, (c, *_rest) in enumerate(order):
        p = planes[idx]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(
    reader: _BitReader, dct: dict, act: dict, qt: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    size = _decode_symbol(reader, dct)
    diff = _extend(reader.read_bits(size), size) if size else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _decode_symbol(reader, act)
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * qt[_ZZ_ROWS, _ZZ_COLS]
    block = _D.T @ coef @ _D + 128.0
    return block, dc


def jpeg_features(payload: bytes, dim: int | None = None) -> np.ndarray:
    """Decode + reduce to the engine's fixed feature vector — the same
    geometry/stats/histogram layout as ``png_features`` so JPEG media rows
    flow through similarity/dedup identically."""
    from .codecs import FEATURE_DIM, _fit

    img = jpeg_decode(payload)
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
    return _fit(feat, dim or FEATURE_DIM)
