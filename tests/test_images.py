"""Image codec invariants: PNG exactness, lossy PSNR, dispatch, stubs."""

import numpy as np
import pytest

from pii_filter_spark.images import decode_image, encode_image, psnr
from pii_filter_spark.images.codecs import _PILImage
from pii_filter_spark.sources.synth import LOSSY_QUALITY, make_image


def _img(seed=0, w=48, h=36):
    return make_image(np.random.default_rng(seed), w, h)


def test_png_roundtrip_exact():
    img = _img(1)
    assert np.array_equal(decode_image(encode_image(img, "png")), img)


def test_png_nonsquare_and_odd_sizes():
    for w, h in [(24, 64), (33, 25), (8, 8)]:
        img = _img(2, w, h)
        dec = decode_image(encode_image(img, "png"))
        assert dec.shape == (h, w, 3)
        assert np.array_equal(dec, img)


def test_lossy_psnr_at_fixture_quality():
    for seed in range(5):
        img = _img(seed, 64, 64)
        dec = decode_image(encode_image(img, "jpeg", quality=LOSSY_QUALITY))
        assert psnr(img, dec) >= 40.0


def test_psnr_identity_is_inf():
    img = _img(3)
    assert psnr(img, img) == float("inf")


def test_unknown_container_rejected():
    with pytest.raises(ValueError):
        decode_image(b"garbage-bytes-here")


def test_real_jpeg_stub_without_pillow():
    if _PILImage is not None:
        pytest.skip("Pillow present; real JPEG decode active")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
