"""Baseline JPEG codec (operators/jpeg.py): round-trip PSNR bounds,
4:2:0 + grayscale paths, marker-level gates.  JPEG is lossy, so
round-trips assert fidelity bounds rather than equality."""

from __future__ import annotations

import numpy as np
import pytest

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
    psnr,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.multimodal import (
    decode_image,
)


def _smooth(h: int, w: int) -> np.ndarray:
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    return np.stack([x, x[::-1], 0.5 * x + 60], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_quality_ladder():
    px = _smooth(29, 37)  # odd dims exercise edge padding
    sizes = []
    for q, floor in ((95, 45.0), (85, 42.0), (50, 35.0)):
        enc = encode_jpeg(px, quality=q)
        dec = decode_jpeg(enc)
        assert dec.shape == px.shape
        assert psnr(px, dec) > floor
        sizes.append(len(enc))
    # lower quality -> smaller file (monotone on smooth content)
    assert sizes[0] > sizes[1] > sizes[2]


def test_jpeg_constant_image_exact():
    const = np.full((8, 16, 3), 100, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(const, quality=100)) == const).all()


def test_jpeg_420_subsampling_roundtrip():
    px = _smooth(29, 37)
    enc444 = encode_jpeg(px, quality=90, subsample=False)
    enc420 = encode_jpeg(px, quality=90, subsample=True)
    assert psnr(px, decode_jpeg(enc420)) > 40.0
    # 4:2:0 carries 1/4 of the chroma blocks -> smaller stream
    assert len(enc420) < len(enc444)


def test_jpeg_grayscale_component_path():
    g = np.linspace(0, 255, 24 * 17).reshape(24, 17).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(g, quality=90))
    assert dec.shape == (24, 17, 3)
    # gray replicated to 3 identical channels
    assert (dec[..., 0] == dec[..., 1]).all()
    assert (dec[..., 0] == dec[..., 2]).all()
    assert psnr(np.repeat(g[..., None], 3, axis=2), dec) > 45.0


def test_jpeg_honest_gates():
    px = _smooth(16, 16)
    enc = bytearray(encode_jpeg(px, quality=90))
    # flip SOF0 -> SOF3 (lossless): must raise, not mis-decode
    # (SOF2/progressive is now a SUPPORTED path — see
    # test_progressive_* below)
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(enc))
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"not a jpeg at all")


def test_jpeg_dispatch_via_decode_image():
    px = _smooth(16, 16)
    dec = decode_image(encode_jpeg(px, quality=95))
    assert dec.shape == px.shape and psnr(px, dec) > 45.0


# ------------------------------------------------------- progressive


def _textured(h, w, seed=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (127 + 90 * np.sin(x / 6) + 30 * np.cos(y / 4)).clip(0, 255),
            (127 + 80 * np.cos(x / 9 + y / 7)).clip(0, 255),
            rng.integers(0, 255, (h, w)).astype(float),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_progressive_decode_equals_baseline_exactly():
    """Progressive delivery of the SAME quantized coefficients must
    decode to EXACTLY the baseline pixels — the strongest check a
    lossy codec admits, across sizes that exercise partial MCUs."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    for h, w, q, seed in ((40, 56, 80, 3), (17, 23, 55, 9), (8, 8, 95, 1)):
        px = _textured(h, w, seed)
        base = decode_jpeg(encode_jpeg(px, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(px, quality=q))
        assert np.array_equal(base, prog), (h, w, q)


def test_progressive_psnr_reasonable():
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    px = _smooth(32, 32)
    dec = decode_jpeg(encode_jpeg_progressive(px, quality=90))
    assert psnr(px, dec) > 35.0


def test_progressive_eobrun_multi_block():
    """Hand-crafted SOF2 stream exercising EOBRUN > 1 (the Annex K
    tables carry no EOBn>0 symbols, so our encoder cannot emit it):
    a custom AC table with EOB1; one AC scan sets a coefficient in
    block 1 then covers blocks 2+3 with a single EOB1."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.jpeg import (
        ZIGZAG,
        _BitWriter,
        _huff_encode_table,
    )

    # 24x8 gray image -> 3 blocks.  DC scan: all diffs 0 (cat 0).
    bits_dc = [0, 1] + [0] * 15
    vals_dc = [0]
    # AC table: symbols EOB0(0x00), EOB1(0x10), (0,1)=0x01
    bits_ac = [0, 0, 1, 2] + [0] * 13
    vals_ac = [0x00, 0x10, 0x01]

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2) + payload

    q = bytes([1] * 64)  # flat quant table of 1s
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + q)
    out += seg(0xC2, bytes([8]) + (8).to_bytes(2) + (24).to_bytes(2)
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(bits_dc[1:]) + bytes(vals_dc))
    out += seg(0xC4, bytes([0x10]) + bytes(bits_ac[1:]) + bytes(vals_ac))
    dctab = _huff_encode_table(bits_dc, vals_dc)
    actab = _huff_encode_table(bits_ac, vals_ac)

    # scan 1: DC first, Al=0 — three blocks, diff 0 each
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    wtr = _BitWriter()
    for _ in range(3):
        code, ln = dctab[0]
        wtr.write(code, ln)
    out += wtr.flush()

    # scan 2: AC first 1..63, Al=0 — block 1: coeff zz[1] = +1 then
    # EOB0; blocks 2,3: one EOB1 (eobrun = 2)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    wtr = _BitWriter()
    code, ln = actab[0x01]
    wtr.write(code, ln)          # (run 0, size 1)
    wtr.write(1, 1)              # +1
    code, ln = actab[0x00]
    wtr.write(code, ln)          # EOB0 for rest of block 1
    code, ln = actab[0x10]
    wtr.write(code, ln)          # EOB1 ...
    wtr.write(0, 1)              # ... + 0 extension bits -> run of 2
    out += wtr.flush()
    out += b"\xff\xd9"

    dec = decode_jpeg(bytes(out))
    assert dec.shape == (8, 24, 3)
    # expected: block 1 has coefficient 1 at zigzag index 1 (natural
    # index 1 -> horizontal cosine), blocks 2-3 all-zero -> flat 128
    import numpy as _np

    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.jpeg import _M

    blk = _np.zeros((8, 8))
    blk[0, 1] = 1.0
    want1 = _np.clip(_M.T @ blk @ _M + 128.0, 0, 255).astype(_np.uint8)
    assert _np.array_equal(dec[:, :8, 0], want1)
    assert (dec[:, 8:, :] == 128).all()


def test_progressive_420_equals_baseline_exactly():
    """4:2:0 progressive == 4:2:0 baseline decode pixel-exactly —
    the odd sizes force the non-interleaved AC scans' COMPONENT
    block grid to diverge from the MCU-padded grid (the luma grid is
    3 blocks wide at w=17 while the padded storage is 4), which is
    precisely the decoder path a 4:4:4-only encoder never hits."""
    from lakehouse_alchemy_bronze_to_gold_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    for h, w, seed in ((17, 23, 5), (24, 40, 8), (33, 31, 2)):
        px = _textured(h, w, seed)
        base = decode_jpeg(encode_jpeg(px, quality=80, subsample=True))
        prog = decode_jpeg(
            encode_jpeg_progressive(px, quality=80, subsample=True)
        )
        assert np.array_equal(base, prog), (h, w)


def test_marker_scan_survives_fill_bytes():
    """Spec-legal 0xFF fill bytes before a marker (FF FF DA) must not
    swallow the marker itself — externally produced JPEGs pad this
    way even though our encoder never does."""
    img = _smooth(16, 16)
    payload = bytearray(encode_jpeg(img, quality=90))
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    padded = bytes(payload[:sos]) + b"\xff" + bytes(payload[sos:])
    out = decode_jpeg(padded)
    assert out.shape == img.shape
    ref = decode_jpeg(bytes(payload))
    assert np.array_equal(out, ref)
