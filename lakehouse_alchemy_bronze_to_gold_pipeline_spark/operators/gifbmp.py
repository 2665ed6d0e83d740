"""From-scratch GIF (LZW) and BMP codecs for the multimodal column.

Same contract as ``operators.multimodal``'s PPM/PNG and
``operators.jpeg``: pure numpy + stdlib, encoder + decoder pairs so
round-trips are testable without external media libraries.  GIF is
palette-based — the encoder raises honestly on >256 distinct colors
(real pipelines quantize first; that's a separate op), the decoder
handles global/local color tables, interlacing, extension blocks, and
full LZW code-width growth with dictionary reset.  BMP covers the
classic 24-bit BI_RGB bottom-up layout.

Decode-side scope gates (animation beyond frame 1 is returned as
frame 1, compressed/paletted BMP raises) are deliberate: the
Spark-side plumbing treats payloads as opaque bytes and the decode
cost model is identical either way.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# --------------------------------------------------------------- LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first bitstream, clear/end codes, code
    width grows (min+1)..12, dictionary reset at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    s = b""
    for px in indices.tobytes():
        c = s + bytes([px])
        if c in table:
            s = c
            continue
        emit(table[s], width)
        if next_code < 4096:
            table[c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # GIF encoders bump width when next emit WOULD overflow
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        s = bytes([px])
    if s:
        emit(table[s], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the cScSc special case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# --------------------------------------------------------------- GIF

#: (row_start, row_step) of the four GIF interlace passes
GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a with a global color table built from the image's
    distinct colors — raises if the image needs quantization
    (>256 distinct RGB triples), which is a separate pipeline op."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise NotImplementedError(
            f"GIF needs a <=256-color palette; image has {len(palette)} "
            "distinct colors (quantize first)"
        )
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    idx = indices.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = [r for start, step in GIF_INTERLACE_PASSES
                for r in range(start, h, step)]
        idx = idx[rows]
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += table.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    comp = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF as (h, w, 3) uint8 — global/local color
    tables, interlacing, LZW width growth + dict reset, extension
    blocks skipped.  Later animation frames are out of scope (frame
    sampling is ``sample_frames``'s job)."""
    if payload[:6] not in GIF_MAGICS:
        raise NotImplementedError(
            f"not a GIF signature: {payload[:6]!r}"
        )
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            _l, _t, w, h, ip = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            table = gct
            if ip & 0x80:
                n = 2 << (ip & 7)
                table = np.frombuffer(
                    payload, np.uint8, n * 3, pos
                ).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF frame without a color table")
            mcs = payload[pos]
            pos += 1
            comp = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                comp += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(comp), mcs, w * h).reshape(h, w)
            if ip & 0x40:
                rows = [r for start, step in GIF_INTERLACE_PASSES
                        for r in range(start, h, step)]
                out = np.empty_like(idx)
                out[rows] = idx
                idx = out
            return table[idx]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image descriptor")


# --------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP: BGR byte order, bottom-up rows, 4-byte row
    padding — the uncompressed layout ~every tool emits."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = pixels[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    off = 14 + 40
    return (
        struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise NotImplementedError(f"not a BMP signature: {payload[:2]!r}")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, stride * h, off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()
