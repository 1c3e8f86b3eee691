"""HEIC/AVIF via the system libheif binding (core/heif_decode):
near-lossless round-trips (chroma 4:4:4 lossless mode, ±1 YCbCr
rounding), format routing for ISO-BMFF brands, and the scanned-image
document route end-to-end. Gates on the shared library being present;
absence must degrade to the typed error, never crash."""

import numpy as np
import pytest

from dedoc_spark.core import heif_decode
from dedoc_spark.core.heif_decode import (
    COMPRESSION_AV1,
    COMPRESSION_HEVC,
    decode_heif,
    encode_heif,
    heif_available,
)

needs_lib = pytest.mark.skipif(
    not heif_available(), reason="system libheif not present"
)


@needs_lib
@pytest.mark.parametrize(
    "compression,brand",
    [(COMPRESSION_AV1, b"avif"), (COMPRESSION_HEVC, b"heic")],
)
def test_roundtrip_near_lossless(compression, brand):
    rgb = np.random.default_rng(91).integers(0, 256, size=(24, 33, 3), dtype=np.uint8)
    data = encode_heif(rgb, compression)
    assert data[4:8] == b"ftyp" and data[8:12] == brand
    w, h, out = decode_heif(data)
    assert (w, h) == (33, 24)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


@needs_lib
def test_decode_image_dispatch_heif():
    from dedoc_spark.core.image_decode import decode_image

    rgb = np.random.default_rng(92).integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    w, h, out = decode_image(encode_heif(rgb, COMPRESSION_AV1))
    assert (w, h) == (11, 9)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


def test_format_routing_brands():
    from dedoc_spark.core.formats import detect_format

    head = b"\x00\x00\x00\x18ftyp"
    assert detect_format("x.bin", head + b"avif" + b"\x00" * 16, None) == "media:image/avif"
    assert detect_format("x.bin", head + b"heic" + b"\x00" * 16, None) == "media:image/heif"
    assert detect_format("x.bin", head + b"mp42" + b"\x00" * 16, None) == "media:video/mp4"
    assert detect_format("x.heic", b"", None) == "media:image/heif"
    assert detect_format("x.avif", b"", None) == "media:image/avif"
    # unknown brand falls through (not misrouted to image)
    assert detect_format("x.bin", head + b"zzzz" + b"\x00" * 16, None) != "media:image/heif"


def test_heif_default_row_stays_typed():
    """Without the opt-in param an HEIC stays the typed media row —
    default output bytes do not depend on libheif."""
    from dedoc_spark.core.document import extract_document

    payload = b"\x00\x00\x00\x18ftypheic" + b"\x00" * 16
    d = extract_document("img.heic", payload, None)
    assert d.get("error") == "needs_decoder:image/heif"


@needs_lib
def test_scanned_avif_document_route():
    from dedoc_spark.core import scanfont
    from dedoc_spark.core.document import extract_document

    raster = scanfont.render_scan_page(["Avif scan line"], scale=2)
    rgb = np.repeat(raster[:, :, None], 3, axis=2)
    d = extract_document(
        "scan.avif",
        encode_heif(rgb, COMPRESSION_AV1),
        None,
        params={"pdf_with_text_layer": "false"},
    )
    assert d.get("error") is None
    assert "Avif scan line" in d["text_extracted"]


def test_missing_library_degrades_typed(monkeypatch):
    monkeypatch.setattr(heif_decode, "_lib", None)
    monkeypatch.setattr(heif_decode, "_lib_tried", True)
    assert not heif_available()
    with pytest.raises(ValueError, match="libheif unavailable"):
        decode_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 16)


@needs_lib
def test_malformed_heif_rejected():
    with pytest.raises(ValueError):
        decode_heif(b"\x00\x00\x00\x18ftypavif" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_heif(b"not a heif at all")
