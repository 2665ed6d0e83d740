"""Multimodal (binary) column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` payloads with a typed
metadata struct.  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested, and
two modalities now have REAL pure-stdlib decoders:

- **image**: binary PPM (``P6``, the Netpbm format) is parsed with
  ``numpy``; PNG (gray 1/2/4/8/16-bit, RGB/RGBA 8/16-bit, PLTE
  palette 1/2/4/8-bit, sequential AND Adam7-interlaced) is decoded
  from scratch per the public PNG spec — chunk walk, zlib inflate,
  all five scanline filters including Paeth, seven-pass deinterlace
  — with a matching minimal encoder for round-trips; and baseline sequential JPEG (SOF0,
  4:4:4 / 4:2:0 / grayscale, restart markers) is decoded from the
  public T.81 spec in ``operators/jpeg.py`` (huffman entropy decode,
  dequantize, orthonormal IDCT, chroma upsample, YCbCr→RGB), again
  with a matching encoder.  ``decode_image`` dispatches on magic
  bytes.
- **audio**: RIFF/WAVE PCM16 via the stdlib ``wave`` module, plus
  G.711 μ-law / A-law WAVs (format codes 7 / 6, which ``wave``
  refuses) through a manual RIFF chunk walk and the ITU-T expansion
  LUTs — sample rate / channels / duration, RMS amplitude and
  zero-crossing rate over the decoded samples.

Formats that genuinely need external libraries (12-bit/arithmetic
JPEG, MP3, video containers) still raise ``NotImplementedError`` —
an honest gate, not a fake decode.  Progressive JPEG (SOF2) decodes
natively as of this round (``jpeg.decode_jpeg`` handles spectral
selection + successive approximation).  ``synthesize_ppm`` / ``synthesize_wav`` render
deterministic payloads from a text column so driver tables without
binary columns can exercise the full encode->decode path.

Scale notes: binary payloads dominate row size, so feature extraction
uses ``mapInPandas`` (Arrow batches, column-pruned input) and callers
should repartition to keep batches << executor memory
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds rows per
batch; payload bytes per batch are what actually matter).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_features — fixed, engine-level contract.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, modality string, "
    "f0 double, f1 double, f2 double, f3 double"
)


def attach_binary_payload(
    df: DataFrame, id_col: str, source_col: str, modality: str = "text"
) -> DataFrame:
    """Opaque binary column + typed metadata struct.

    In production the payload comes off object storage; here it is
    derived from a source column (utf-8 bytes) so tests are
    self-contained."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit(modality).alias("modality"),
        ).alias("media_meta"),
    )


# --------------------------------------------------- real codecs


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (``P6``) bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (``P6``) -> (h, w, 3) uint8.  Pure-stdlib header
    scan per the Netpbm spec: magic, then three whitespace-separated
    ints (``#`` comments allowed), one whitespace byte, raw RGB."""
    if payload[:2] != b"P6":
        raise NotImplementedError(
            "decode_ppm handles binary PPM (P6) only; "
            f"got magic {payload[:2]!r} (use decode_image for dispatch)"
        )
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM (maxval 255) supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 -> minimal PNG bytes: 8-bit truecolor,
    filter 0 on every scanline, one IDAT.  ``interlace=True`` emits
    Adam7 pass order (each pass its own filtered scanline run) —
    the decoder-test fixture for progressive rendering support."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body))
        )

    if interlace:
        parts = []
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes() for y in range(len(sub)))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    # the PNG spec's Paeth predictor: nearest of left/up/up-left to
    # the linear estimate a + b - c
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_scanlines(
    raw: bytes, offset: int, w: int, h: int, nch: int, depth: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one run of ``h`` scanlines of ``w`` pixels
    starting at ``offset`` in the inflated IDAT stream.  Returns
    ((h, w, nch) uint8 samples — 16-bit narrowed to the high byte,
    sub-byte depths unpacked big-endian-within-byte — and the number
    of stream bytes consumed).  This is the shared kernel for the
    single sequential run of a non-interlaced image and for each of
    the seven independent Adam7 passes (filters never reference
    across pass boundaries)."""
    bpp = max(1, (nch * depth) // 8)
    stride = (w * nch * depth + 7) // 8
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        row = bytearray(raw[base + 1 : base + 1 + stride])
        ftype = raw[base]
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = prev = np.frombuffer(bytes(row), dtype=np.uint8)
    if depth == 16:
        px = (out.view(">u2") >> 8).astype(np.uint8).reshape(h, w, nch)
    elif depth == 8:
        px = out.reshape(h, w, nch)
    else:  # packed 1/2/4-bit samples, big-endian within each byte
        bits = np.unpackbits(out, axis=1)[:, : w * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        px = (
            (bits.reshape(h, w, depth) * weights)
            .sum(axis=2)
            .astype(np.uint8)
            .reshape(h, w, 1)
        )
    return px, need


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8, implemented from the public spec:
    chunk walk, zlib-inflated IDAT stream, per-scanline unfiltering
    (None/Sub/Up/Average/Paeth).  Supports grayscale (0, depths
    1/2/4/8/16), RGB (2, 8/16), palette (3, depths 1/2/4/8 via the
    PLTE lookup), gray+alpha (4, 8/16) and RGBA (6, 8/16), each both
    sequential and Adam7-interlaced (seven independently-filtered
    sub-image passes scattered onto the pixel grid); gray replicates
    to 3 channels, alpha is dropped, 16-bit narrows to the high byte
    (the spec's 16->8 reduction)."""
    if payload[:8] != PNG_SIG:
        raise NotImplementedError(
            "image decode supports binary PPM (P6) and PNG; "
            f"got magic {payload[:4]!r} — JPEG etc. need external libraries"
        )
    pos, w = 8, None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                     4: (8, 16), 6: (8, 16)}
            if color not in legal:
                raise ValueError(f"bad PNG color type {color}")
            if depth not in legal[color]:
                raise ValueError(
                    f"illegal PNG depth {depth} for color type {color}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace method {interlace}")
        elif tag == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR chunk")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    # Filters operate on BYTES; the left-reference offset is the pixel
    # size in whole bytes, floored to 1 for packed sub-byte rows
    # (RFC 2083 §6.2: "bpp is rounded up to one").
    if interlace:
        px = np.zeros((h, w, nch), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:  # empty pass emits no scanlines
                continue
            sub, used = _decode_scanlines(raw, offset, pw, ph, nch, depth)
            px[y0::dy, x0::dx] = sub
            offset += used
        if offset != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    else:
        px, used = _decode_scanlines(raw, 0, w, h, nch, depth)
        if used != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        if int(px.max()) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[px[..., 0]]
    if color == 0:
        if depth < 8:  # expand to full 8-bit range (255/(2^d - 1))
            px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
                np.uint8
            )
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # RGB, or RGBA with alpha dropped


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch over the supported image containers:
    PNG (from-scratch, ``decode_png``), baseline JPEG (from-scratch,
    ``operators.jpeg``), binary PPM."""
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gifbmp import decode_gif

        return decode_gif(payload)
    if payload[:2] == b"BM":
        from .gifbmp import decode_bmp

        return decode_bmp(payload)
    return decode_ppm(payload)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) image — the classic
    index-map formulation (numpy fancy indexing, no loops)."""
    h, w, _ = pixels.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return pixels[rows[:, None], cols[None, :]]


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """int16 PCM samples (interleaved if multi-channel) -> WAV bytes
    via the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# G.711 companding (public ITU-T spec): 256-entry decode LUTs built
# from the segment/mantissa formulas.


def _ulaw_table() -> np.ndarray:
    out = np.zeros(256, dtype=np.int16)
    for u in range(256):
        c = ~u & 0xFF
        sign, exp, man = c & 0x80, (c >> 4) & 0x07, c & 0x0F
        s = (((man << 3) + 0x84) << exp) - 0x84
        out[u] = -s if sign else s
    return out


def _alaw_table() -> np.ndarray:
    out = np.zeros(256, dtype=np.int16)
    for a in range(256):
        c = a ^ 0x55
        sign, exp, man = c & 0x80, (c >> 4) & 0x07, c & 0x0F
        if exp == 0:
            s = (man << 4) + 8
        else:
            s = ((man << 4) + 0x108) << (exp - 1)
        out[a] = s if sign else -s
    return out


_ULAW = _ulaw_table()
_ALAW = _alaw_table()


def encode_ulaw(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 μ-law bytes (the G.711 encoder, for round-trip
    tests and synthetic corpora)."""
    x = samples.astype(np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = np.floor(np.log2(mag)).astype(np.int64) - 7
    man = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | man) & 0xFF).astype(np.uint8)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (int16 samples, sample_rate, n_channels).

    PCM16 goes through the stdlib ``wave`` reader; G.711 μ-law /
    A-law WAVs (format codes 7 / 6 — ``wave`` refuses them) are
    parsed with a manual RIFF chunk walk and expanded through the
    G.711 LUTs.  Other codecs raise."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, fmt_code, rate, n_ch, data = 12, None, 0, 1, None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + size]
            if tag == b"fmt ":
                fmt_code, n_ch, rate = struct.unpack_from(
                    "<HHI", body, 0
                )
            elif tag == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt_code in (6, 7) and data is not None:
            lut = _ULAW if fmt_code == 7 else _ALAW
            return lut[np.frombuffer(data, dtype=np.uint8)], rate, n_ch
        if fmt_code not in (1, None):
            raise NotImplementedError(
                f"WAV format code {fmt_code} not supported "
                "(PCM16, mu-law, A-law are)"
            )
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        frames = wf.readframes(wf.getnframes())
        return (
            np.frombuffer(frames, dtype="<i2"),
            wf.getframerate(),
            wf.getnchannels(),
        )


def decode_features(payload: bytes, modality: str) -> list[float]:
    """Real per-payload decode -> 4 features.

    - ``text``: size + head-byte stats (no decode needed);
    - ``image``: PPM or PNG decode (magic dispatch) -> width, height,
      mean / std of Rec.601 luminance (normalized);
    - ``audio``: WAV decode -> duration s, channels, RMS amplitude
      (normalized), zero-crossing rate.

    Anything else (or an image/audio container this environment cannot
    decode without external libraries) raises ``NotImplementedError``.
    """
    if modality == "text":
        head = payload[:16].ljust(16, b"\0")
        return [
            len(payload) / 1024.0,
            head[0] / 255.0,
            head[7] / 255.0,
            sum(head) / (16 * 255.0),
        ]
    if modality == "image":
        px = decode_image(payload).astype(np.float64)
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        h, w = luma.shape
        return [float(w), float(h), luma.mean() / 255.0, luma.std() / 255.0]
    if modality == "audio":
        samples, rate, n_ch = decode_wav(payload)
        x = samples.astype(np.float64) / 32768.0
        zcr = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if len(x) > 1
            else 0.0
        )
        duration = len(x) / (rate * n_ch) if rate else 0.0
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        return [duration, float(n_ch), rms, zcr]
    raise NotImplementedError(
        f"{modality!r} decode needs media libraries not present "
        "in this environment"
    )


#: Back-compat alias — the former stub is now a real decoder for
#: text/PPM/WAV and still raises for formats needing external libs.
decode_stub = decode_features


# ------------------------------------------- deterministic synthesis


def _cycled_bytes(text: str, n: int) -> np.ndarray:
    """First ``n`` bytes of ``text`` utf-8 repeated end-to-end (the
    deterministic 'pixel/sample generator' for tables that carry no
    real media column)."""
    src = np.frombuffer(
        (text or "\0").encode("utf-8", errors="ignore") or b"\0",
        dtype=np.uint8,
    )
    reps = -(-n // len(src))
    return np.tile(src, reps)[:n]


def synthesize_ppm(
    df: DataFrame, id_col: str = "doc_id", source_col: str = "text"
) -> DataFrame:
    """Render a real binary PPM per row: W/H derive from the id
    (mixed sizes), pixels from the text bytes cycled — so decoding is
    a genuine parse of a genuine image, reproducible across runs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, t in zip(pdf[id_col], pdf[source_col]):
                w, h = 8 + int(i) % 9, 8 + int(i) % 7
                px = _cycled_bytes(t, w * h * 3).reshape(h, w, 3)
                payloads.append(encode_ppm(px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_meta": [
                        {"n_bytes": len(p), "modality": "image"}
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(
        run,
        schema="doc_id bigint, payload binary, "
        "media_meta struct<n_bytes: bigint, modality: string>",
    )


def synthesize_mixed_images(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "text",
    pixel_id_col: str | None = None,
) -> DataFrame:
    """Like ``synthesize_ppm`` but rotating the container per row
    (doc_id % 6: PPM, PNG, JPEG, GIF, BMP, progressive JPEG) — the
    corpus shape a real
    ingest sees, exercising every decoder through one binary column.
    GIF is safe without quantization here because the synthetic
    images have < 256 distinct colors by construction (w*h <= 224).

    ``pixel_id_col`` decouples WHAT the image is (dims + pixel seed)
    from WHICH row carries it: rows sharing a pixel id render the
    same image in (usually) different containers — the planted-
    duplicate fixture for cross-codec perceptual dedup."""
    from .gifbmp import encode_bmp, encode_gif
    from .jpeg import encode_jpeg, encode_jpeg_progressive

    pix_col = pixel_id_col or id_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, codecs = [], []
            for i, pix, t in zip(pdf[id_col], pdf[pix_col], pdf[source_col]):
                w, h = 8 + int(pix) % 9, 8 + int(pix) % 7
                px = _cycled_bytes(t, w * h * 3).reshape(h, w, 3)
                k = int(i) % 6
                if k == 0:
                    payloads.append(encode_ppm(px))
                    codecs.append("ppm")
                elif k == 1:
                    payloads.append(encode_png(px))
                    codecs.append("png")
                elif k == 2:
                    payloads.append(encode_jpeg(px, quality=90))
                    codecs.append("jpeg")
                elif k == 3:
                    payloads.append(encode_gif(px, interlace=i % 2 == 1))
                    codecs.append("gif")
                elif k == 5:
                    payloads.append(encode_jpeg_progressive(px, quality=90))
                    codecs.append("jpeg_prog")
                else:
                    payloads.append(encode_bmp(px))
                    codecs.append("bmp")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "codec": codecs,
                    "media_meta": [
                        {"n_bytes": len(p), "modality": "image"}
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(
        run,
        schema="doc_id bigint, payload binary, codec string, "
        "media_meta struct<n_bytes: bigint, modality: string>",
    )


def synthesize_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "text",
    sample_rate: int = 8000,
) -> DataFrame:
    """Render a real PCM16 WAV per row: sample count derives from the
    id, samples from the text bytes (centered, scaled to int16)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, t in zip(pdf[id_col], pdf[source_col]):
                n = 400 + int(i) % 256
                raw = _cycled_bytes(t, n).astype(np.int16)
                samples = (raw - 128) * 256  # byte -> centered int16
                payloads.append(encode_wav(samples, sample_rate))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_meta": [
                        {"n_bytes": len(p), "modality": "audio"}
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(
        run,
        schema="doc_id bigint, payload binary, "
        "media_meta struct<n_bytes: bigint, modality: string>",
    )


#: output schema of resize_images — decoded, resized, re-encoded PPM
IMAGE_RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, w_in int, h_in int, "
    "w_out int, h_out int"
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize: decode (PPM or PNG, magic dispatch) ->
    nearest-neighbor resample -> re-encode PPM, Arrow-batched.  The
    binary-in/binary-out shape is what a PIL/opencv stage would have
    at scale; only the resample kernel is simpler (NN instead of
    Lanczos)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "payload": [],
                "w_in": [], "h_in": [], "w_out": [], "h_out": [],
            }
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_image(bytes(p))
                out = resize_nearest(px, out_w, out_h)
                rows["doc_id"].append(i)
                rows["payload"].append(encode_ppm(out))
                rows["h_in"].append(px.shape[0])
                rows["w_in"].append(px.shape[1])
                rows["h_out"].append(out.shape[0])
                rows["w_out"].append(out.shape[1])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=IMAGE_RESIZE_SCHEMA)


#: output schema of resize_payloads
RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, n_bytes_in bigint, n_bytes_out bigint, "
    "modality string"
)


def resize_payloads(
    df: DataFrame, target_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """'Resize' stage: maps each binary payload to a fixed-size
    representation.  For real images this is where PIL/opencv would
    decode-resize-reencode; the container has no media libs, so the
    transform is a deterministic truncate/pad — the Spark-side
    contract (binary in, binary out, Arrow batches, metadata carried)
    is the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = [
                bytes(p[:target_bytes]).ljust(target_bytes, b"\0")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out_payloads,
                    "n_bytes_in": [len(p) for p in pdf["payload"]],
                    "n_bytes_out": [len(p) for p in out_payloads],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


#: output schema of sample_frames — one row per sampled frame
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    stride: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling stage (video-shaped): explode each payload into
    every ``stride``-th fixed-size chunk — one output row per frame.
    A real decoder would seek keyframes; the chunking stub keeps the
    1->N row expansion, schema, and batch shape real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                n_frames = max(len(p) // frame_bytes, 0)
                for k in range(0, n_frames, stride):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(
                        bytes(p[k * frame_bytes : (k + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — real
    decode per modality (``decode_features``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_features(p, m)
                for p, m in zip(
                    pdf["payload"], [m["modality"] for m in pdf["media_meta"]]
                )
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "f0": [f[0] for f in feats],
                    "f1": [f[1] for f in feats],
                    "f2": [f[2] for f in feats],
                    "f3": [f[3] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------- perceptual hashing


def average_hash(px: np.ndarray) -> int:
    """64-bit aHash: luma -> 8x8 nearest-neighbor downsample -> bit
    per cell above the mean.  Identical pixels hash identically; mild
    re-encoding noise (JPEG) flips few bits — which is the point."""
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    small = resize_nearest(
        np.repeat(luma[..., None], 3, axis=2).astype(np.float64), 8, 8
    )[..., 0]
    bits = (small > small.mean()).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


def dhash(px: np.ndarray) -> int:
    """64-bit dHash: 9x8 luma downsample, bit = left<right gradient —
    more robust than aHash to global brightness shifts."""
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    small = resize_nearest(
        np.repeat(luma[..., None], 3, axis=2).astype(np.float64), 9, 8
    )[..., 0]
    bits = (small[:, :-1] < small[:, 1:]).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


def image_hashes(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, ahash, dhash) per image payload — decode (magic dispatch)
    + two 64-bit perceptual hashes, Arrow-batched.  The dedup join
    downstream is a plain groupBy on the hash column: perceptual
    near-dup at scale = exact dedup on a robust fingerprint (the
    image-side analogue of SimHash for text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = [decode_image(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    # int64 view keeps the column a Spark BIGINT
                    "ahash": [
                        np.uint64(average_hash(x)).astype(np.int64)
                        for x in px
                    ],
                    "dhash": [
                        np.uint64(dhash(x)).astype(np.int64) for x in px
                    ],
                }
            )

    return df.mapInPandas(run, schema="doc_id bigint, ahash bigint, dhash bigint")


def synthesize_media_containers(
    df: DataFrame, id_col: str = "doc_id", source_col: str = "text"
) -> DataFrame:
    """Rotating audio/video CONTAINER payloads (doc_id % 2: MP4
    skeleton, MP3 CBR stream) with metadata derived deterministically
    from the row — the triage-stage fixture: real headers, no media
    data (decoding them is the honest-raise gate; probing them is
    ``media_probe``)."""
    from .gifbmp import encode_mp3_stub, encode_mp4_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for i, t in zip(pdf[id_col], pdf[source_col]):
                i = int(i)
                if i % 2 == 0:
                    payloads.append(
                        encode_mp4_stub(
                            1000 + (i * 37) % 600_000,
                            320 + 16 * (i % 50),
                            240 + 16 * (i % 30),
                            n_audio=1 + i % 2,
                        )
                    )
                    kinds.append("mp4")
                else:
                    # cap frames: triage reads HEADERS, so payload
                    # size only inflates synthesis cost, not coverage
                    payloads.append(
                        encode_mp3_stub(
                            1 + (len(t) + i) % 40,
                            (128, 192, 320)[i % 3],
                            (44100, 48000)[i % 2],
                        )
                    )
                    kinds.append("mp3")
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "payload": payloads, "kind": kinds}
            )

    return df.mapInPandas(
        run, schema="doc_id bigint, payload binary, kind string"
    )


def media_probe(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Container-metadata triage: magic-dispatch each payload to the
    MP4 box walk / MP3 frame-header probe / image decode (dims only)
    and emit one normalized metadata row — duration, dimensions,
    track/frame counts — WITHOUT decoding media data.  This is the
    routing step a 100 TB ingest runs on every object before deciding
    which (expensive) decode fleet sees it.

    ``on_error="quarantine"`` routes malformed/unknown payloads to a
    ``container='corrupt'`` row instead of failing the batch — the
    badRecordsPath behavior real scrapes need (one rotten object must
    not kill a million-object task); ``"raise"`` (default) keeps the
    strict contract for curated inputs."""
    from .gifbmp import probe_mp3, probe_mp4

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine: {on_error!r}")

    def probe_one(i: int, p: bytes):
        if len(p) >= 8 and p[4:8] == b"ftyp":
            m = probe_mp4(p)
            return (i, "mp4", m["duration_ms"], m["width"],
                    m["height"], m["n_video"] + m["n_audio"])
        if p[:3] == b"ID3" or (
            len(p) > 1 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0
        ):
            m = probe_mp3(p)
            return (i, "mp3", m["duration_ms"],
                    m["sample_rate"], m["bitrate_kbps"], m["n_frames"])
        px = decode_image(p)
        return (i, "image", 0, px.shape[1], px.shape[0], 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rows.append(probe_one(int(i), bytes(p)))
                except Exception:
                    if on_error == "raise":
                        raise
                    rows.append((int(i), "corrupt", 0, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "container", "duration_ms", "dim0",
                         "dim1", "n_units"],
            )

    return df.mapInPandas(
        run,
        schema="doc_id bigint, container string, duration_ms bigint, "
        "dim0 bigint, dim1 bigint, n_units bigint",
    )
