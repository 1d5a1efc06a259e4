"""Image invariants (SURVEY.md §5 item 4): lossless exact, lossy PSNR>=40."""

import numpy as np
import pytest

from langtoolsosm_spark.functions import imagecodec as ic


RNG = np.random.default_rng(11)


def _img(h, w):
    # smooth-ish image (random noise is worst-case for DCT; blend both)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin(yy / 7.0) * np.cos(xx / 5.0)
    noise = RNG.normal(0, 12, (h, w, 3))
    px = np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)
    return px


@pytest.mark.parametrize("fmt", ["raw", "bmp", "png"])
@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (64, 33)])
def test_lossless_roundtrip_exact(fmt, shape):
    px = _img(*shape)
    buf = ic.encode(px, fmt)
    out = ic.decode(buf, fmt)
    assert out.dtype == np.uint8 and out.shape == px.shape
    assert (out == px).all()


@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (64, 64), (33, 57)])
def test_dctq_psnr_at_least_40(shape):
    px = _img(*shape)
    out = ic.decode(ic.encode(px, "dctq"), "dctq")
    assert out.shape == px.shape
    assert ic.psnr(px, out) >= 40.0, f"PSNR {ic.psnr(px, out):.1f} < 40"


def test_dctq_on_pure_noise_still_ok():
    px = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = ic.decode(ic.encode(px, "dctq"), "dctq")
    assert ic.psnr(px, out) >= 40.0


def test_png_filters_decode():
    # we emit filter 0 only, but the decoder must handle 1-4 too;
    # craft a tiny image and hand-encode with filter 2 (up)
    import struct, zlib

    px = _img(4, 4)
    raw = np.zeros((4, 1 + 12), dtype=np.uint8)
    raw[0, 0] = 0
    raw[0, 1:] = px[0].reshape(-1)
    for y in range(1, 4):
        raw[y, 0] = 2
        raw[y, 1:] = (px[y].reshape(-1).astype(np.int32) - px[y - 1].reshape(-1)) % 256
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    buf = (
        ic._PNG_SIG
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + ic._chunk(b"IEND", b"")
    )
    assert (ic.decode_png(buf) == px).all()


def test_phash_properties():
    px = _img(48, 48)
    h1 = ic.phash64(px)
    assert isinstance(h1, int)
    assert -(1 << 63) <= h1 < (1 << 63)
    # identical image -> identical hash; lossy roundtrip -> near hash
    assert ic.phash64(px.copy()) == h1
    lossy = ic.decode(ic.encode(px, "dctq"), "dctq")
    assert ic.phash_hamming(h1, ic.phash64(lossy)) <= 6
    # a very different image -> far hash
    other = _img(48, 48)[::-1, ::-1]
    px2 = np.clip(255 - other.astype(int), 0, 255).astype(np.uint8)
    assert ic.phash_hamming(h1, ic.phash64(px2)) > 10
