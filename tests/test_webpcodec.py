"""WebP lossless (VP8L) decoder parity vs the official libwebp.

Oracle: the container's system libwebp.so.7 via ctypes
(tests/webp_oracle.py) — the OFFICIAL codec both generates fixtures
(WebPEncodeLosslessRGBA) and defines ground truth (WebPDecodeRGBA).
All comparisons are bit-exact, the same contract as the JPEG suite's
JVM-ImageIO oracle.

Beyond encoder-generated fixtures, crafted probe streams
(tools/webp_probe.py) pin the spec tables that are easy to
mis-transcribe: every predictor mode over random residuals, the
color-transform multiplier layout, and a full re-derivation of the
120-entry 2D distance map.
"""

from __future__ import annotations

import glob
import os
import struct
import sys

import numpy as np
import pytest

from tests import webp_oracle as W

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import webp_probe as P  # noqa: E402
from tantivy_spark.functions.imagecodec import decode_image
from tantivy_spark.functions.webpcodec import _DIST_MAP, decode_webp

LIB = W.load()

pytestmark = pytest.mark.skipif(LIB is None, reason="libwebp.so.7 absent")


def _photo(h, w, seed):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    yi = np.linspace(0, h // 8, h)
    xi = np.linspace(0, w // 8, w)
    y0, x0 = yi.astype(int), xi.astype(int)
    fy = (yi - y0)[:, None, None]
    fx = (xi - x0)[None, :, None]
    img = (base[y0][:, x0] * (1 - fy) * (1 - fx)
           + base[y0 + 1][:, x0] * fy * (1 - fx)
           + base[y0][:, x0 + 1] * (1 - fy) * fx
           + base[y0 + 1][:, x0 + 1] * fy * fx)
    img = np.clip(img + r.normal(0, 6, img.shape), 0, 255).astype(np.uint8)
    return np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], -1)


def _fixtures():
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:50, 0:70]
    pal17 = np.array([[i * 15 % 256, i * 37 % 256, i * 73 % 256, 255]
                      for i in range(17)], np.uint8)
    pal2 = np.array([[0, 0, 0, 255], [255, 255, 255, 255]], np.uint8)
    pal4 = np.array([[i * 60, i * 40, 255 - i * 60, 255]
                     for i in range(4)], np.uint8)
    return {
        # photo-like: predictor transform + meta prefix codes + cache
        "photo": _photo(150, 200, 1),
        "photo_odd": _photo(97, 131, 2),
        "wide": _photo(16, 300, 3),
        "tall": _photo(300, 16, 4),
        "one_px": rng.integers(0, 256, (1, 1, 4), dtype=np.uint8),
        # random alpha incl. zeros (encoder may rewrite RGB under a=0 —
        # the contract is vs WebPDecodeRGBA of the blob, not the input)
        "noise": rng.integers(0, 256, (40, 55, 4), dtype=np.uint8),
        "flat": np.full((9, 9, 4), 77, np.uint8),
        "gradient": np.stack([xx * 3 % 256, yy * 5 % 256,
                              (xx + yy) * 2 % 256,
                              np.full_like(xx, 255)], -1).astype(np.uint8),
        # palette sizes straddling the 2/4/16 packing thresholds,
        # widths not divisible by pixels-per-byte
        "pal17": pal17[rng.integers(0, 17, (33, 45))],
        "pal2_oddw": pal2[rng.integers(0, 2, (29, 31))],
        "pal4_oddw": pal4[rng.integers(0, 4, (15, 21))],
        "alpha_grad": np.stack([yy * 5 % 256, yy * 5 % 256, yy * 5 % 256,
                                xx * 3 % 256], -1).astype(np.uint8),
    }


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_encoder_fixture_bit_exact(name):
    img = np.ascontiguousarray(_fixtures()[name])
    blob = W.encode_lossless(LIB, img)
    ref = W.decode_rgba(LIB, blob)
    got = decode_webp(blob)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


def test_decode_image_dispatch():
    img = _fixtures()["gradient"]
    blob = W.encode_lossless(LIB, np.ascontiguousarray(img))
    assert np.array_equal(decode_image(blob), decode_webp(blob))


@pytest.mark.parametrize("mode", range(14))
def test_predictor_mode_probe(mode):
    """Crafted stream: single-block predictor transform of each mode
    with random residuals, bit-exact vs libwebp.  Covers Select
    tie-breaks, ClampAddSubtractHalf's truncating division, and the
    top-right pixel at the last column."""
    rng = np.random.default_rng(1000 + mode)
    res = [tuple(int(v) for v in rng.integers(0, 256, 4))
           for _ in range(13 * 9)]
    blob = P.stream_predictor(13, 9, mode, res)
    assert np.array_equal(decode_webp(blob), W.decode_rgba(LIB, blob))


def test_color_transform_probe():
    rng = np.random.default_rng(77)
    for _ in range(4):
        g2r, g2b, r2b = (int(v) for v in rng.integers(0, 256, 3))
        px = [tuple(int(v) for v in rng.integers(0, 256, 4))
              for _ in range(8 * 5)]
        blob = P.stream_color_transform(8, 5, g2r, g2b, r2b, px)
        assert np.array_equal(decode_webp(blob), W.decode_rgba(LIB, blob))


def test_distance_map_rederived():
    """The embedded 120-entry 2D distance map equals what probing the
    official decoder yields, and our decoder agrees with libwebp on
    every probe stream (both widths)."""
    assert P.probe_dist_map(LIB) == list(_DIST_MAP)
    for code in (1, 2, 7, 40, 77, 96, 119, 120, 121, 200):
        for width, height in ((64, 12), (37, 16)):
            if code > 120 and code - 120 > width * height - 1:
                continue
            blob = P.stream_one_copy(width, height, code)
            assert np.array_equal(decode_webp(blob),
                                  W.decode_rgba(LIB, blob)), (code, width)


def test_vp8x_container():
    """Extended (VP8X) container around a VP8L payload decodes the
    same image."""
    img = np.ascontiguousarray(_fixtures()["gradient"])
    blob = W.encode_lossless(LIB, img)
    vp8l = blob[20: 20 + struct.unpack("<I", blob[16:20])[0]]
    h, w = img.shape[:2]
    vp8x = struct.pack("<4sIB3s3s3s", b"VP8X", 10, 0, b"\x00\x00\x00",
                       struct.pack("<I", w - 1)[:3],
                       struct.pack("<I", h - 1)[:3])
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(chunk)) \
        + b"WEBP" + vp8x + chunk
    assert np.array_equal(decode_webp(wrapped), W.decode_rgba(LIB, wrapped))


def test_lossy_dispatches_to_vp8():
    """decode_webp routes "VP8 " chunks to the lossy decoder
    (tests/test_vp8codec.py owns its parity suite)."""
    img = np.ascontiguousarray(_fixtures()["photo"])
    blob = W.encode_lossy(LIB, img, 75.0)
    assert np.array_equal(decode_webp(blob), W.decode_rgba(LIB, blob))


@pytest.mark.parametrize("aq,afilt", [
    (100, 1),      # no preprocessing (control)
    (90, 0),       # preprocessed levels, no alpha filter
    (50, 1),       # preprocessed levels, horizontal-ish filter
    (50, 2),       # preprocessed levels, best-filter search
    (10, 1),       # aggressive quantization
])
def test_alpha_preprocessed_levels_bit_exact(aq, afilt):
    """ALPH preprocessed-levels (alpha_quality < 100): the encoder
    quantized the plane, the coded levels are the output — libwebp's
    default decode applies NO dequant smoothing (that is the opt-in
    decoder alpha_dithering path), verified bit-exact here across
    quality / filter-method sweeps via the advanced-API oracle
    encoder."""
    rng = np.random.default_rng(aq * 10 + afilt)
    h, w = 41, 57
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    # smooth many-level alpha so quantization + filtering both engage
    rgba[..., 3] = ((xx * 255 // w + yy * 2) % 256).astype(np.uint8)
    blob = W.encode_advanced(LIB, rgba, quality=75.0, alpha_quality=aq,
                             alpha_filtering=afilt)
    # confirm the stream really is a preprocessed-levels ALPH
    i, pre = 12, None
    while i + 8 <= len(blob):
        fourcc = blob[i:i + 4]
        sz = struct.unpack("<I", blob[i + 4:i + 8])[0]
        if fourcc == b"ALPH":
            pre = (blob[i + 8] >> 4) & 3
        i += 8 + sz + (sz & 1)
    assert pre == (0 if aq == 100 else 1)
    ref = W.decode_rgba(LIB, blob)
    got = decode_webp(blob)
    assert np.array_equal(got, ref)


def test_real_os_webp_files():
    """Any .webp shipped with the OS/toolchain must be bit-exact
    (lossless AND lossy), except lossy-with-alpha which raises the
    documented ValueError."""
    files = glob.glob("/root/.pyenv/versions/*/lib/python*/test/**/*.webp",
                      recursive=True)
    if not files:
        pytest.skip("no .webp files on disk")
    seen = 0
    for path in files[:5]:
        blob = open(path, "rb").read()
        try:
            ref = W.decode_rgba(LIB, blob)
        except RuntimeError:
            continue
        seen += 1
        try:
            got = decode_webp(blob)
        except ValueError as e:
            assert "ALPH" in str(e)
            continue
        assert np.array_equal(got, ref)
    assert seen > 0
