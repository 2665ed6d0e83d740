"""Baseline JPEG codec, implemented from the public JPEG/JFIF spec
(ITU-T T.81 Annex K tables) with numpy only — no external media libs.

Scope (honest gates, like the PNG decoder in ``multimodal.py``):

- **decode**: baseline sequential (SOF0) AND progressive (SOF2 —
  spectral selection, successive approximation with DC/AC
  refinement scans, EOBRUN) DCT, 8-bit, grayscale or YCbCr
  3-component, 4:4:4 / 4:2:0 / 4:2:2 chroma sampling, restart
  markers.  Both paths share one coefficient store; reconstruction
  is a single vectorized dequantize + IDCT.  Arithmetic coding,
  12-bit precision, lossless/hierarchical SOFs and >3 components
  raise ``NotImplementedError``.
- **encode**: 4:4:4 baseline plus a progressive encoder
  (``encode_jpeg_progressive``, 10-scan script) producing the SAME
  quantized coefficients — so progressive decode must match the
  baseline decode EXACTLY, the strongest round-trip a lossy format
  admits (and what the tests assert).  Annex K tables throughout.

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


def _block_dc(rdr, dctab, pred, ci, blk, Ah, Al):
    """DC coefficient for one block: first scan (Ah=0) decodes a
    huffman-coded diff at point-transform Al; refinement (Ah>0)
    appends one bit (T.81 G.2 / F.2.2.1)."""
    if Ah == 0:
        sym = rdr.huff(dctab)
        diff = _extend(rdr.bits(sym), sym) if sym else 0
        pred[ci] += diff
        blk[0] = pred[ci] << Al
    else:
        if rdr.bits(1):
            blk[0] |= 1 << Al


def _block_ac_first(rdr, actab, blk, Ss, Se, Al, eobrun):
    """AC band, first pass (Ah=0): run-length + EOBRUN semantics
    (T.81 G.1.2.2).  Returns the remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = rdr.huff(actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += rdr.bits(r)
            return eobrun - 1  # the run includes this block
        k += r
        if k > Se:
            raise ValueError("AC index out of band")
        blk[k] = _extend(rdr.bits(s), s) << Al
        k += 1
    return 0


def _block_ac_refine(rdr, actab, blk, Ss, Se, Al, eobrun):
    """AC band refinement (Ah>0): one correction bit per
    already-nonzero coefficient crossed; runs count zero-history
    positions only; newly-significant coefficients arrive as
    (run, 1) + sign (T.81 G.1.2.3; the libjpeg-documented control
    flow).  Returns the remaining end-of-band run."""
    p1, m1 = 1 << Al, -1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = rdr.huff(actab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.bits(r)
                    break
                # ZRL: cross 16 zero-history coefficients
                r = 16
            else:
                if s != 1:
                    raise ValueError("refinement scan with s != 1")
                newval = p1 if rdr.bits(1) else m1
                r += 1  # land ON the (r+1)-th zero-history position
            while k <= Se:
                if blk[k] != 0:
                    if rdr.bits(1) and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    r -= 1
                    if r == 0:
                        break
                k += 1
            if newval != 0 and k <= Se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            if blk[k] != 0:
                if rdr.bits(1) and (int(blk[k]) & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _block_baseline(rdr, dctab, actab, pred, ci, blk):
    """Whole-block sequential decode (SOF0): DC diff + AC run-length
    to EOB — the original baseline path, now writing into the shared
    coefficient store."""
    sym = rdr.huff(dctab)
    diff = _extend(rdr.bits(sym), sym) if sym else 0
    pred[ci] += diff
    blk[0] = pred[ci]
    k = 1
    while k < 64:
        rs = rdr.huff(actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        blk[k] = _extend(rdr.bits(s), s)
        k += 1


def _decode_scan(
    payload, pos, scan, Ss, Se, Ah, Al, comps, coef, huff,
    restart_interval, hmax, vmax, mcux, mcuy, w, h, progressive,
):
    """Decode one entropy-coded scan into the coefficient store.

    Interleaved scans (ns > 1, or any baseline scan) walk MCUs;
    progressive single-component scans walk THAT component's own
    block raster — dimensions derived from the component's sampling,
    not the MCU grid (the classic non-interleaved-grid gotcha).
    Returns the byte position after the scan's data."""
    rdr = _BitReader(payload, pos)
    pred = [0] * len(comps)
    eobrun = 0
    interleaved = len(scan) > 1 or not progressive

    if interleaved:
        units = mcuy * mcux
    else:
        ci = scan[0][0]
        _, hs, vs, _ = comps[ci]
        bw = -(-(-(-w * hs // hmax)) // 8)
        bh = -(-(-(-h * vs // vmax)) // 8)
        units = bw * bh

    unit = 0
    while unit < units:
        if restart_interval and unit and unit % restart_interval == 0:
            rdr.acc = rdr.n = 0
            p = rdr.pos
            while not (
                payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7
            ):
                p += 1
            rdr.pos = p + 2
            pred = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci, tdc, tac in scan:
                _, hs, vs, _ = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = coef[ci][my * vs + by, mx * hs + bx]
                        if not progressive:
                            _block_baseline(
                                rdr, huff[(0, tdc)], huff[(1, tac)],
                                pred, ci, blk,
                            )
                        elif Ss == 0:
                            _block_dc(rdr, huff[(0, tdc)], pred, ci,
                                      blk, Ah, Al)
                        else:
                            raise ValueError(
                                "interleaved progressive AC scan"
                            )
        else:
            ci, tdc, tac = scan[0]
            by, bx = divmod(unit, bw)
            blk = coef[ci][by, bx]
            if Ss == 0:
                _block_dc(rdr, huff[(0, tdc)], pred, ci, blk, Ah, Al)
            elif Ah == 0:
                eobrun = _block_ac_first(
                    rdr, huff[(1, tac)], blk, Ss, Se, Al, eobrun
                )
            else:
                eobrun = _block_ac_refine(
                    rdr, huff[(1, tac)], blk, Ss, Se, Al, eobrun
                )
        unit += 1
    return rdr.pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes -> (h, w, 3) uint8 RGB (grayscale replicated).

    Handles baseline sequential (SOF0) and progressive (SOF2 —
    spectral selection + successive approximation, DC and AC
    refinement scans, EOBRUN, restart markers).  Both paths share
    one coefficient store per component; reconstruction is a single
    vectorized dequantize + IDCT after the last scan."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError(
            f"not a JPEG (magic {payload[:2]!r})"
        )
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, h_samp, v_samp, tq)
    progressive = False
    h = w = 0
    restart_interval = 0
    coef = None
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False

    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            # spec-legal 0xFF fill byte: advance ONE so the closing
            # 0xFF+marker pair (e.g. FF FF DA) is still recognized
            pos += 1
            continue
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
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0) and progressive (SOF2) JPEG "
                f"supported, got SOF marker 0x{marker:02X}"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            progressive = marker == 0xC2
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
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coef = [
                np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int32)
                for c in comps
            ]
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
        elif marker == 0xDA:  # SOS: decode this scan's entropy data
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    j for j, c in enumerate(comps) if c[0] == cs
                )
                scan.append((ci, tabs >> 4, tabs & 0x0F))
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            Ah, Al = a >> 4, a & 0x0F
            pos = _decode_scan(
                payload, pos + 2 + length, scan, Ss, Se, Ah, Al,
                comps, coef, huff, restart_interval,
                hmax, vmax, mcux, mcuy, w, h, progressive,
            )
            saw_scan = True
            continue
        pos += 2 + length
    if comps is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")

    # ------------------------------- reconstruct: dequant + IDCT
    full = []
    for (cid, hs, vs, tq), cf in zip(comps, coef):
        q = qtables[tq].astype(np.float64)  # natural order
        nby, nbx, _ = cf.shape
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[..., ZIGZAG] = cf
        nat = nat.reshape(nby, nbx, 8, 8) * q.reshape(8, 8)
        # IDCT of B is M.T @ B @ M, vectorized over all blocks
        px = np.einsum("ji,abjk,kl->abil", _M, nat, _M) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
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


# ------------------------------------------------- progressive encoder

#: default progressive scan script: DC first at Al=1 (interleaved),
#: luma AC in two spectral bands at Al=2, chroma AC at Al=1, then
#: DC refinement and AC refinements down to Al=0.  Exercises every
#: decoder path: spectral selection, successive approximation first
#: + refine, ZRL-in-refinement, and correction-bit ordering.
PROGRESSIVE_SCANS = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _emit_ac_first(wtr, tab, zz, Ss, Se, Al):
    """One block of an AC first scan (Ah=0): run-length over the
    point-transformed band, EOB per block (EOBRUN kept at 1 — valid
    syntax; the decoder's longer-run path is covered by a crafted
    stream in tests)."""
    vals = [
        (abs(int(zz[k])) >> Al) * (1 if zz[k] >= 0 else -1)
        for k in range(Ss, Se + 1)
    ]
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    run = 0
    for i, v in enumerate(vals):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = tab[0xF0]
            wtr.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = tab[(run << 4) | cat]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < len(vals) - 1:
        code, ln = tab[0x00]  # EOB
        wtr.write(code, ln)


def _emit_ac_refine(wtr, tab, zz, Ss, Se, Al):
    """One block of an AC refinement scan (Ah = Al+1 -> Al),
    mirroring the decoder's crossing POSITION-FOR-POSITION: a ZRL's
    16-zero-history window flushes exactly the correction bits the
    decoder reads while crossing that window (flushing the whole
    buffer — the tempting shortcut — desyncs the stream)."""
    band = list(range(Ss, Se + 1))
    t = {k: abs(int(zz[k])) >> Al for k in band}
    hist = {k: (abs(int(zz[k])) >> (Al + 1)) != 0 for k in band}
    targets = [k for k in band if t[k] == 1 and not hist[k]]
    for k in band:
        if t[k] > 1 and not hist[k]:
            raise ValueError("successive approximation step != 1")

    k = Ss

    def corr_bits(lo, hi):  # history correction bits in [lo, hi]
        for j in range(lo, hi + 1):
            if hist[j]:
                wtr.write(t[j] & 1, 1)

    for p in targets:
        # zero-history positions strictly before p (later targets
        # cannot sit in (k, p): targets are processed in order)
        zeros = [j for j in range(k, p) if not hist[j] and t[j] == 0]
        nz = len(zeros)
        while nz > 15:
            q = zeros[len(zeros) - nz + 15]  # 16th remaining zero
            code, ln = tab[0xF0]
            wtr.write(code, ln)
            corr_bits(k, q)
            k = q + 1
            nz -= 16
        code, ln = tab[(nz << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if zz[p] > 0 else 0, 1)
        corr_bits(k, p - 1)
        k = p + 1
    if k <= Se:
        code, ln = tab[0x00]  # EOB, then the tail's correction bits
        wtr.write(code, ln)
        corr_bits(k, Se)


def encode_jpeg_progressive(
    px: np.ndarray, quality: int = 85, scans=PROGRESSIVE_SCANS,
    subsample: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF, 4:4:4 or
    4:2:0 (``subsample=True``).

    Same quantized coefficients as ``encode_jpeg`` (same subsample
    construction) at the same quality, delivered over a multi-scan
    script — so a full decode must reproduce the baseline decode
    EXACTLY (pixel equality, not just PSNR), which the round-trip
    tests assert for both samplings.  The 4:2:0 form matters for
    decoder coverage: non-interleaved AC scans walk each component's
    OWN block grid, which diverges from the MCU-padded grid exactly
    when sampling factors differ (padded blocks past the component
    grid stay zero on both sides — they are never visible)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ql, qc = _scaled_qtables(quality)
    ycc = rgb_to_ycbcr(px)
    hs_l, vs_l = (2, 2) if subsample else (1, 1)
    samp = [(hs_l, vs_l), (1, 1), (1, 1)]
    hmax, vmax = hs_l, vs_l
    mcu_h, mcu_w = 8 * vs_l, 8 * hs_l
    H, W = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    ycc = np.pad(ycc, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    planes = [ycc[..., 0] - 128.0]
    if subsample:
        for comp in (1, 2):
            pl = ycc[..., comp]
            planes.append(
                pl.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3)) - 128.0
            )
    else:
        planes += [ycc[..., 1] - 128.0, ycc[..., 2] - 128.0]
    blocks = [
        _block_dct_quant(pl, ql if i == 0 else qc)
        for i, pl in enumerate(planes)
    ]
    zz = [
        b.reshape(b.shape[0], b.shape[1], 64)[:, :, ZIGZAG]
        for b in blocks
    ]
    mcux, mcuy = W // mcu_w, H // mcu_h

    dc_tabs = (
        _huff_encode_table(*HUFF_DC_LUMA),
        _huff_encode_table(*HUFF_DC_CHROMA),
    )
    ac_tabs = (
        _huff_encode_table(*HUFF_AC_LUMA),
        _huff_encode_table(*HUFF_AC_CHROMA),
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2) + w.to_bytes(2) + bytes([3])
    for i, (cid, q) in enumerate(((1, 0), (2, 1), (3, 1))):
        hs, vs = samp[i]
        sof += bytes([cid, (hs << 4) | vs, q])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(HUFF_DC_LUMA[0][1:])
               + bytes(HUFF_DC_LUMA[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(HUFF_AC_LUMA[0][1:])
               + bytes(HUFF_AC_LUMA[1]))
    out += seg(0xC4, bytes([0x01]) + bytes(HUFF_DC_CHROMA[0][1:])
               + bytes(HUFF_DC_CHROMA[1]))
    out += seg(0xC4, bytes([0x11]) + bytes(HUFF_AC_CHROMA[0][1:])
               + bytes(HUFF_AC_CHROMA[1]))

    for comps_in_scan, Ss, Se, Ah, Al in scans:
        sos = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            tdc = 0 if ci == 0 else 1
            tac = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tdc << 4) | tac])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += seg(0xDA, sos)

        wtr = _BitWriter()
        if Ss == 0:  # DC scan: interleaved MCU walk (all samplings)
            if Ah == 0:
                pred = {ci: 0 for ci in comps_in_scan}
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in comps_in_scan:
                            t = 0 if ci == 0 else 1
                            hs, vs = samp[ci]
                            for iy in range(vs):
                                for ix in range(hs):
                                    v = int(
                                        zz[ci][my * vs + iy,
                                               mx * hs + ix, 0]
                                    ) >> Al
                                    diff = v - pred[ci]
                                    pred[ci] = v
                                    cat = _category(diff)
                                    code, ln = dc_tabs[t][cat]
                                    wtr.write(code, ln)
                                    if cat:
                                        wtr.write(
                                            diff if diff >= 0
                                            else diff + (1 << cat) - 1,
                                            cat,
                                        )
            else:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in comps_in_scan:
                            hs, vs = samp[ci]
                            for iy in range(vs):
                                for ix in range(hs):
                                    wtr.write(
                                        (int(zz[ci][my * vs + iy,
                                                    mx * hs + ix, 0])
                                         >> Al) & 1,
                                        1,
                                    )
        else:  # AC scan: single component over ITS OWN block grid
            (ci,) = comps_in_scan
            t = 0 if ci == 0 else 1
            hs, vs = samp[ci]
            bw = -(-(-(-w * hs // hmax)) // 8)
            bh = -(-(-(-h * vs // vmax)) // 8)
            for by in range(bh):
                for bx in range(bw):
                    if Ah == 0:
                        _emit_ac_first(
                            wtr, ac_tabs[t], zz[ci][by, bx], Ss, Se, Al
                        )
                    else:
                        _emit_ac_refine(
                            wtr, ac_tabs[t], zz[ci][by, bx], Ss, Se, Al
                        )
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)
