"""Baseline JPEG codec, implemented from the public JPEG/JFIF spec
(ITU-T T.81 Annex K tables) with numpy only — no external media libs.

Scope (honest gates, like the PNG decoder in ``multimodal.py``):

- **decode**: baseline sequential DCT (SOF0), 8-bit, grayscale or
  YCbCr 3-component, 4:4:4 / 4:2:0 / 4:2:2 chroma sampling, restart
  markers.  Progressive (SOF2), arithmetic coding, 12-bit precision
  and >3 components raise ``NotImplementedError``.
- **encode**: 4:4:4 baseline with the Annex K example quantization
  (scalable by quality) and huffman tables — enough to produce real
  spec-conformant files for round-trip tests and synthetic corpora.

JPEG is lossy: round-trips assert PSNR bounds, not equality.

Scale note: this runs inside Arrow-batched ``mapInPandas`` stages
(see ``multimodal.py``); per-image work is pure numpy with the only
Python-level loop over huffman symbols, which is inherent to the
entropy coding.  At 100 TB the same plumbing would call libjpeg-turbo
via PIL — the Spark-side contract (binary in / ndarray out, batch
shape, partition sizing) is identical.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------- tables
# Annex K.1/K.2 example quantization tables (luminance, chrominance).
QTABLE_LUMA = np.array(
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
)
QTABLE_CHROMA = np.array(
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
)

#: zigzag scan order: ZIGZAG[i] = natural index of the i-th scanned coeff
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 typical huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II matrix; DCT of block B is  M @ B @ M.T
_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _huff_encode_table(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 C.2."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, values):
    """(bits, values) -> {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    """Bit-size category of a DC diff / AC value (T.81 F.1.2.1.1)."""
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at any
    other marker (the caller handles RST/EOI)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(self.data[self.pos : self.pos + 2], self.pos)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def byte_align(self) -> None:
        self.n -= self.n % 8
        self.acc &= (1 << self.n) - 1


class _MarkerHit(Exception):
    def __init__(self, marker: bytes, pos: int):
        self.marker = marker
        self.pos = pos


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1: map received bits to signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float YCbCr per the JFIF formulas."""
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(
        np.float64
    ), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _scaled_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling of the Annex K tables (1..100)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for t in (QTABLE_LUMA, QTABLE_CHROMA):
        q = np.clip((t * scale + 50) // 100, 1, 255)
        out.append(q.astype(np.int32))
    return out[0], out[1]


# ----------------------------------------------------------- encoder


def _block_dct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (multiple of 8) -> (H/8, W/8, 8, 8) int64
    quantized DCT coefficients, fully vectorized."""
    H, W = plane.shape
    b = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,lk->abil", _M, b, _M)
    return np.round(coef / q.reshape(8, 8)).astype(np.int64)


def encode_jpeg(
    px: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsample=False`` emits 4:4:4; ``subsample=True`` emits 4:2:0
    (2x2 luma blocks per MCU, chroma averaged 2x2 — exercises the
    decoder's multi-block MCU + upsampling path)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ql, qc = _scaled_qtables(quality)
    ycc = rgb_to_ycbcr(px)

    hs_l, vs_l = (2, 2) if subsample else (1, 1)
    mcu_h, mcu_w = 8 * vs_l, 8 * hs_l
    H, W = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    ycc = np.pad(ycc, ((0, H - h), (0, W - w), (0, 0)), mode="edge")

    planes = [ycc[..., 0] - 128.0]
    if subsample:
        for comp in (1, 2):
            p = ycc[..., comp]
            planes.append(
                p.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3)) - 128.0
            )
    else:
        planes += [ycc[..., 1] - 128.0, ycc[..., 2] - 128.0]

    dc_tabs = (
        _huff_encode_table(*HUFF_DC_LUMA),
        _huff_encode_table(*HUFF_DC_CHROMA),
    )
    ac_tabs = (
        _huff_encode_table(*HUFF_AC_LUMA),
        _huff_encode_table(*HUFF_AC_CHROMA),
    )
    blocks = [
        _block_dct_quant(p, ql if i == 0 else qc)
        for i, p in enumerate(planes)
    ]
    samp = [(hs_l, vs_l), (1, 1), (1, 1)]

    wtr = _BitWriter()
    pred = [0, 0, 0]
    for my in range(H // mcu_h):
        for mx in range(W // mcu_w):
            for comp in range(3):
                t = min(comp, 1)
                hs, vs = samp[comp]
                for iy in range(vs):
                    for ix in range(hs):
                        blk = blocks[comp][my * vs + iy, mx * hs + ix]
                        zz = blk.reshape(64)[ZIGZAG]
                        # DC
                        diff = int(zz[0]) - pred[comp]
                        pred[comp] = int(zz[0])
                        cat = _category(diff)
                        code, ln = dc_tabs[t][cat]
                        wtr.write(code, ln)
                        if cat:
                            wtr.write(
                                diff if diff >= 0
                                else diff + (1 << cat) - 1,
                                cat,
                            )
                        # AC: run-length of zeros + category
                        run = 0
                        nz = np.nonzero(zz)[0]
                        last_nz = int(nz.max()) if len(nz) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if k > last_nz:
                                code, ln = ac_tabs[t][0x00]  # EOB
                                wtr.write(code, ln)
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_tabs[t][0xF0]  # ZRL
                                wtr.write(code, ln)
                                run -= 16
                            cat = _category(v)
                            code, ln = ac_tabs[t][(run << 4) | cat]
                            wtr.write(code, ln)
                            wtr.write(
                                v if v >= 0 else v + (1 << cat) - 1, cat
                            )
                            run = 0

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2) + payload

    def dht(tc_th: int, bits, values) -> bytes:
        return bytes([tc_th]) + bytes(bits[1:]) + bytes(values)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2) + w.to_bytes(2) + bytes([3])
    for i, (cid, q) in enumerate(((1, 0), (2, 1), (3, 1))):
        hs, vs = samp[i]
        sof += bytes([cid, (hs << 4) | vs, q])
    out += seg(0xC0, sof)
    out += seg(0xC4, dht(0x00, *HUFF_DC_LUMA))
    out += seg(0xC4, dht(0x10, *HUFF_AC_LUMA))
    out += seg(0xC4, dht(0x01, *HUFF_DC_CHROMA))
    out += seg(0xC4, dht(0x11, *HUFF_AC_CHROMA))
    sos = bytes([3])
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tabs])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_gray(gray: np.ndarray, quality: int = 85) -> bytes:
    """(h, w) uint8 -> 1-component baseline JFIF (the grayscale
    decode path's test vector generator)."""
    h, w = gray.shape
    assert gray.dtype == np.uint8
    ql, _ = _scaled_qtables(quality)
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(
        gray.astype(np.float64), ((0, H - h), (0, W - w)), mode="edge"
    ) - 128.0
    blocks = _block_dct_quant(plane, ql)
    dc_tab = _huff_encode_table(*HUFF_DC_LUMA)
    ac_tab = _huff_encode_table(*HUFF_AC_LUMA)
    wtr = _BitWriter()
    pred = 0
    for by in range(H // 8):
        for bx in range(W // 8):
            zz = blocks[by, bx].reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            cat = _category(diff)
            code, ln = dc_tab[cat]
            wtr.write(code, ln)
            if cat:
                wtr.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            run = 0
            nz = np.nonzero(zz)[0]
            last_nz = int(nz.max()) if len(nz) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    code, ln = ac_tab[0x00]
                    wtr.write(code, ln)
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = ac_tab[(run << 4) | cat]
                wtr.write(code, ln)
                wtr.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                run = 0

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2) + w.to_bytes(2)
               + bytes([1, 1, 0x11, 0]))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(HUFF_DC_LUMA[0][1:]) + bytes(HUFF_DC_LUMA[1]),
    )
    out += seg(
        0xC4,
        bytes([0x10]) + bytes(HUFF_AC_LUMA[0][1:]) + bytes(HUFF_AC_LUMA[1]),
    )
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale
    replicated to 3 channels)."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError(
            f"not a JPEG (magic {payload[:2]!r})"
        )
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, h_samp, v_samp, tq)
    scan = None  # list of (comp_index, dc_table, ac_table)
    h = w = 0
    restart_interval = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int32)
                qtables[tq] = tab
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) supported, "
                f"got SOF marker 0x{marker:02X}"
            )
        elif marker == 0xC0:  # SOF0
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(body[1:3])
            w = int.from_bytes(body[3:5])
            n = body[5]
            if n not in (1, 3):
                raise NotImplementedError(f"{n}-component JPEG")
            comps = []
            for i in range(n):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = [0] + list(body[i + 1 : i + 17])
                nval = sum(bits)
                values = list(body[i + 17 : i + 17 + nval])
                huff[(tc, th)] = _huff_decode_table(bits, values)
                i += 17 + nval
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    j for j, c in enumerate(comps) if c[0] == cs
                )
                scan.append((ci, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + length
            break
        pos += 2 + length
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient planes (padded to whole MCUs)
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    rdr = _BitReader(payload, pos)
    idct = lambda blk: _M.T @ blk @ _M  # noqa: E731

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                # drop pad bits + any buffered bytes, seek past RSTn
                rdr.acc = rdr.n = 0
                p = rdr.pos
                while not (
                    payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
                ):
                    p += 1
                rdr.pos = p + 2
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, tdc, tac in scan:
                cid, hs, vs, tq = comps[ci]
                q = qtables[tq].reshape(8, 8)
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.float64)
                        sym = rdr.huff(huff[(0, tdc)])
                        diff = _extend(rdr.bits(sym), sym) if sym else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.huff(huff[(1, tac)])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(rdr.bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        blk = idct(blk.reshape(8, 8) * q) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk

    # upsample subsampled components to full resolution (nearest)
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        gray = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(gray[..., None], 3, axis=2)
    return ycbcr_to_rgb(np.stack(full, axis=-1))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean(
        (a.astype(np.float64) - b.astype(np.float64)) ** 2
    )
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0 * 255.0 / mse))
