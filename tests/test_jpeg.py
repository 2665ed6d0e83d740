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
    # flip SOF0 -> SOF2 (progressive): must raise, not mis-decode
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(enc))
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"not a jpeg at all")


def test_jpeg_dispatch_via_decode_image():
    px = _smooth(16, 16)
    dec = decode_image(encode_jpeg(px, quality=95))
    assert dec.shape == px.shape and psnr(px, dec) > 45.0
