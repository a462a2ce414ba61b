"""Baseline JPEG codec tests (stages/jpeg.py): spec-path coverage via
round-trips (lossy — PSNR thresholds), an exact fixture (uniform image is
DC-only and survives quantization exactly), and honest error paths."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smse_backend_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_uniform_image_roundtrips_exactly():
    px = np.full((16, 24), 130, dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(px, 90))
    assert (w, h) == (24, 16) and (out == px).all()


def test_rgb_roundtrip_all_paths():
    """4:4:4, 4:2:0 and restart intervals all decode above a PSNR floor on
    smooth content; restarts must not change the result at all."""
    px = _gradient(37, 53)
    base = decode_jpeg(encode_jpeg(px, 90))[2]
    assert _psnr(base, px) > 40
    sub = decode_jpeg(encode_jpeg(px, 90, subsample=True))[2]
    assert _psnr(sub, px) > 35
    rst = decode_jpeg(encode_jpeg(px, 90, restart_interval=2))[2]
    assert (rst == base).all()
    sub_rst = decode_jpeg(encode_jpeg(px, 90, subsample=True, restart_interval=3))[2]
    assert (sub_rst == sub).all()


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=20),
    q=st.sampled_from([80, 90, 95]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_roundtrip_property(w, h, q, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    w2, h2, out = decode_jpeg(encode_jpeg(px, q))
    assert (w2, h2) == (w, h) and out.shape == px.shape
    # random noise is JPEG's worst case (q80 chroma quant alone costs ~20 dB)
    assert _psnr(out, px) > 18


def test_gray_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(20, 28), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(px, 95))
    assert (w, h) == (28, 20) and out.ndim == 2
    assert _psnr(out, px) > 30


def test_appn_and_com_segments_are_skipped():
    """Real-world JPEGs carry APP0/JFIF, APPn and COM segments before SOF;
    the chunk walk must skip them by length."""
    px = _gradient(10, 12)
    data = encode_jpeg(px, 90)
    app0 = b"\xff\xe0" + (len(b"JFIF\x00\x01\x02") + 2).to_bytes(2, "big") + b"JFIF\x00\x01\x02"
    com = b"\xff\xfe" + (9 + 2).to_bytes(2, "big") + b"a comment"
    patched = data[:2] + app0 + com + data[2:]
    w, h, out = decode_jpeg(patched)
    assert (w, h) == (12, 10)
    assert (out == decode_jpeg(data)[2]).all()


def test_progressive_sof_raises():
    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6 1 1 255 abc")
