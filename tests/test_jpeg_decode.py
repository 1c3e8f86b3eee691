"""Baseline JPEG decoder tests: round-trip against the independent minimal
encoder (quantization-bounded error), hand-verifiable flat images, the
reference's own scanned JPEG, and scope errors for progressive streams."""

import numpy as np
import pytest

from dedoc_spark.core.image_decode import decode_image
from dedoc_spark.core.jpeg_decode import decode_jpeg, encode_jpeg_gray


def test_flat_image_exact_within_one():
    img = np.full((16, 24), 77, dtype=np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg_gray(img))
    assert (w, h) == (24, 16)
    assert np.abs(rgb[:, :, 0].astype(int) - 77).max() <= 1


def test_gradient_roundtrip_quant_bounded():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    w, h, rgb = decode_jpeg(encode_jpeg_gray(img))
    err = np.abs(rgb[:, :, 0].astype(float) - img.astype(float))
    assert (w, h) == (64, 64)
    assert err.max() <= 8 and err.mean() < 2.5  # Q50 quantization noise


def test_non_multiple_of_8_dimensions():
    img = (np.arange(13 * 21, dtype=np.int64) % 200).astype(np.uint8).reshape(13, 21)
    w, h, rgb = decode_jpeg(encode_jpeg_gray(img))
    assert (w, h) == (21, 13) and rgb.shape == (13, 21, 3)


def test_reference_scanned_page():
    """The reference's scanned-page JPEG (827×1170, 4:2:0 color) decodes to
    its SOF dimensions with mostly-white pixel stats."""
    data = open("/root/reference/tests/data/scanned/example.jpeg", "rb").read()
    w, h, rgb = decode_jpeg(data)
    assert (w, h) == (827, 1170)
    assert rgb.mean() > 240  # a scanned white page
    assert rgb.std() > 5  # but not blank — there is text


def test_progressive_real_image():
    """Progressive JPEG (SOF2 with DC/AC spectral-selection + successive-
    approximation scans): the reference's progressive scan decodes to its
    SOF dimensions with scanned-page stats."""
    data = open("/root/reference/tests/data/tz/small_image.jpg", "rb").read()
    w, h, rgb = decode_jpeg(data)
    assert (w, h) == (1656, 2339)
    assert rgb.mean() > 240 and rgb.std() > 5


def test_cross_format_ground_truth():
    """The corpus holds the SAME scanned page as lossless PNG and as JPEG:
    our JPEG decode must match the PNG pixels up to compression noise —
    ground truth fully independent of our own encoder."""
    from dedoc_spark.core.image_decode import decode_image

    png = decode_image(open("/root/reference/tests/data/scanned/example.png", "rb").read())
    jpg = decode_image(open("/root/reference/tests/data/scanned/example.jpeg", "rb").read())
    assert (png[0], png[1]) == (jpg[0], jpg[1]) == (827, 1170)
    a, b = png[2].astype(float), jpg[2].astype(float)
    diff = np.abs(a - b)
    assert diff.mean() < 2.0
    assert float(np.corrcoef(a.ravel(), b.ravel())[0, 1]) > 0.99


def test_dispatch_via_decode_image():
    img = np.full((8, 8), 128, dtype=np.uint8)
    w, h, rgb = decode_image(encode_jpeg_gray(img))
    assert (w, h) == (8, 8)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 truncated jpeg")
