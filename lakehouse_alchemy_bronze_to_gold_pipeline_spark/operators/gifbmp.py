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


# ------------------------------------------- container triage (probe)
#
# Video/MP3 DECODE genuinely needs external libraries (the honest
# NotImplementedError gates in ``multimodal``) — but ingest pipelines
# rarely decode at triage time: they read container METADATA (codec,
# duration, dimensions) straight from the headers and route/filter on
# it.  These probes implement that step from the public specs: the
# ISO-BMFF box walk (ftyp/moov/mvhd/trak/hdlr) and the MPEG-1/2
# audio frame header + ID3v2 skip.

MP3_BITRATES = (  # kbps, MPEG-1 Layer III
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
MP3_SAMPLE_RATES = (44100, 48000, 32000)


def encode_mp4_stub(
    duration_ms: int, width: int, height: int, n_audio: int = 1
) -> bytes:
    """Minimal ISO-BMFF skeleton (ftyp + moov(mvhd + traks) + empty
    mdat) carrying real metadata — the fixture for the probe; there
    is no media data, which is exactly the point."""
    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + tag + body

    mvhd = box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, 1000, duration_ms) + b"\0" * 80,
    )
    traks = b""
    for hdlr_type, wh in [(b"vide", (width, height))] + [
        (b"soun", (0, 0))
    ] * n_audio:
        hdlr = box(b"hdlr", b"\0" * 8 + hdlr_type + b"\0" * 13)
        tkhd = box(
            b"tkhd",
            b"\0" * 76 + struct.pack(">II", wh[0] << 16, wh[1] << 16),
        )
        traks += box(b"trak", tkhd + box(b"mdia", hdlr))
    return (
        box(b"ftyp", b"mp42\0\0\0\0mp42isom")
        + box(b"moov", mvhd + traks)
        + box(b"mdat", b"")
    )


def probe_mp4(payload: bytes) -> dict:
    """Walk top-level and moov/trak boxes: brand, duration_ms, video
    dimensions, track type counts.  Raises on a non-BMFF payload."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF (ftyp) payload")
    out = {
        "container": "mp4",
        "brand": payload[8:12].decode("latin1"),
        "duration_ms": 0,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 0,
    }

    def walk(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack_from(">I", payload, pos)[0]
            tag = payload[pos + 4 : pos + 8]
            if size < 8 or pos + size > hi:
                break
            body = pos + 8
            if tag in (b"moov", b"trak", b"mdia"):
                walk(body, pos + size, depth + 1)
            elif tag == b"mvhd":
                timescale, dur = struct.unpack_from(">II", payload, body + 12)
                if timescale:
                    out["duration_ms"] = dur * 1000 // timescale
            elif tag == b"tkhd":
                w16, h16 = struct.unpack_from(">II", payload, body + 76)
                if w16:
                    out["width"], out["height"] = w16 >> 16, h16 >> 16
            elif tag == b"hdlr":
                kind = payload[body + 8 : body + 12]
                if kind == b"vide":
                    out["n_video"] += 1
                elif kind == b"soun":
                    out["n_audio"] += 1
            pos += size

    walk(0, len(payload), 0)
    return out


def encode_mp3_stub(
    n_frames: int, bitrate_kbps: int = 128, sample_rate: int = 44100
) -> bytes:
    """ID3v2 tag + ``n_frames`` valid MPEG-1 Layer III frame headers
    with zeroed payloads (silence-shaped CBR stream)."""
    bidx = MP3_BITRATES.index(bitrate_kbps)
    sidx = MP3_SAMPLE_RATES.index(sample_rate)
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    hdr = bytes(
        [0xFF, 0xFB, (bidx << 4) | (sidx << 2), 0]
    )
    tag_body = b"\0" * 32
    id3 = b"ID3\x04\x00\x00" + bytes(
        [0, 0, (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
    ) + tag_body
    return id3 + (hdr + b"\0" * (frame_len - 4)) * n_frames


def probe_mp3(payload: bytes) -> dict:
    """Skip ID3v2 (syncsafe length), parse the first frame header,
    count sync-aligned frames, estimate duration (1152 samples per
    MPEG-1 Layer III frame).  Raises on no sync."""
    pos = 0
    if payload[:3] == b"ID3":
        sz = payload[6:10]
        pos = 10 + (
            (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
        )
    if pos + 4 > len(payload) or payload[pos] != 0xFF or (
        payload[pos + 1] & 0xE0
    ) != 0xE0:
        raise NotImplementedError("no MPEG audio frame sync found")
    b2 = payload[pos + 2]
    bitrate = MP3_BITRATES[b2 >> 4]
    rate = MP3_SAMPLE_RATES[(b2 >> 2) & 3]
    frame_len = 144 * bitrate * 1000 // rate
    n_frames = 0
    p = pos
    while p + 4 <= len(payload) and payload[p] == 0xFF:
        n_frames += 1
        p += frame_len
    return {
        "container": "mp3",
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1152 * 1000 // rate,
    }
