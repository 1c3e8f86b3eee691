"""JBIG2 (core/jbig2): MQ coder pair, generic regions over all four
templates, TPGDON, MMR mode, embedded-stream segment plumbing, and the
scanned-PDF route. The encoder is the validation instrument — both
sides implement T.88 E.2/E.3 independently of each other's tables use,
and the template-0 decoder takes the sliding-window fast path while the
encoder always uses the generic sorted-template gather, so a round-trip
cross-checks the two context constructions."""

import numpy as np
import pytest

from dedoc_spark.core.jbig2 import (
    Jbig2Error,
    MQDecoder,
    MQEncoder,
    decode_embedded,
    decode_generic,
    encode_embedded,
    encode_generic,
)


def _rand_bits(seed, shape, p=0.3):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < p).astype(np.uint8)


@pytest.mark.parametrize("p", [0.02, 0.3, 0.7])
def test_mq_coder_roundtrip(p):
    rng = np.random.default_rng(int(p * 100))
    bits = (rng.random(4000) < p).astype(int).tolist()
    enc = MQEncoder()
    icx, mps = bytearray(4), bytearray(4)
    for i, b in enumerate(bits):
        enc.encode(icx, mps, i % 4, b)  # exercise several contexts
    data = enc.flush()
    dec = MQDecoder(data)
    icx, mps = bytearray(4), bytearray(4)
    out = [dec.decode(icx, mps, i % 4) for i in range(len(bits))]
    assert out == bits


def test_mq_coder_stuffing_after_ff():
    """A run forcing 0xFF bytes into the stream must round-trip (byte
    stuffing limits the post-0xFF byte to <= 0x8F)."""
    bits = [1] * 600 + [0, 1] * 300 + [0] * 100
    enc = MQEncoder()
    icx, mps = bytearray(1), bytearray(1)
    for b in bits:
        enc.encode(icx, mps, 0, b)
    data = enc.flush()
    for i, byte in enumerate(data[:-1]):
        if byte == 0xFF:
            assert data[i + 1] <= 0x8F
    dec = MQDecoder(data)
    icx, mps = bytearray(1), bytearray(1)
    assert [dec.decode(icx, mps, 0) for _ in bits] == bits


@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_generic_region_roundtrip(template):
    img = _rand_bits(template + 7, (40, 57))
    body = encode_generic(img, template=template)
    assert np.array_equal(decode_generic(body, 57, 40, template=template), img)


def test_generic_region_fast_path_equals_general():
    """Template 0 decodes via the sliding-window fast path; a custom AT
    pixel forces the general gather — same stream semantics when the AT
    is moved and the encoder mirrors it."""
    img = _rand_bits(5, (30, 41))
    at = [(1, -1), (-3, -1), (2, -2), (-2, -2)]  # AT1 moved off nominal
    from dedoc_spark.core.jbig2 import _sorted_template

    # encode with the same custom template ordering
    enc_body = _encode_with_at(img, at)
    out = decode_generic(enc_body, 41, 30, template=0, at=at)
    assert np.array_equal(out, img)


def _encode_with_at(bitmap, at):
    from dedoc_spark.core.jbig2 import MQEncoder, _sorted_template

    pos = _sorted_template(0, at)
    h, w = bitmap.shape
    enc = MQEncoder()
    icx, mps = bytearray(1 << 16), bytearray(1 << 16)
    pad = 4
    rows = [bytearray(w + 8) for _ in range(2)]
    for y in range(h):
        cur = bytearray(w + 8)
        grid = {-2: rows[-2], -1: rows[-1], 0: cur}
        for x in range(w):
            ctx = 0
            for dy, dx in pos:
                ctx = (ctx << 1) | grid[dy][pad + x + dx]
            b = int(bitmap[y, x]) & 1
            enc.encode(icx, mps, ctx, b)
            cur[pad + x] = b
        rows.append(cur)
        rows.pop(0)
    return enc.flush()


@pytest.mark.parametrize("mmr", [False, True])
def test_embedded_stream_roundtrip(mmr):
    img = _rand_bits(11, (25, 33))
    page = decode_embedded(encode_embedded(img, mmr=mmr))
    assert np.array_equal(page, img)


def test_embedded_unsupported_segment_raises():
    stream = bytearray(encode_embedded(_rand_bits(1, (8, 8))))
    # flip the region segment type (offset: after the 11-byte page-info
    # segment header + 19-byte payload, byte 4 of the next header)
    off = 11 + 19 + 4
    assert stream[off] == 39
    stream[off] = 16  # halftone pattern dictionary
    with pytest.raises(Jbig2Error):
        decode_embedded(bytes(stream))


def _glyphs_and_expected(page_w=60, page_h=24):
    """Three random glyphs of two heights stamped at known spots, plus
    the numpy-composited expectation."""
    glyphs = [
        _rand_bits(21, (7, 5), p=0.5),
        _rand_bits(22, (7, 4), p=0.5),
        _rand_bits(23, (9, 6), p=0.5),
    ]
    placements = [
        (0, 2, 3), (1, 9, 3), (0, 15, 3), (2, 22, 2),
        (2, 5, 13), (1, 13, 13), (0, 40, 14), (0, 47, 14),
    ]
    page = np.zeros((page_h, page_w), dtype=np.uint8)
    for g, x, y in placements:
        bm = glyphs[g]
        page[y : y + bm.shape[0], x : x + bm.shape[1]] |= bm
    return glyphs, placements, page


@pytest.mark.parametrize("log_strips", [0, 2])
@pytest.mark.parametrize("ref_corner", [0, 1, 2, 3])
def test_symbol_text_region_roundtrip(log_strips, ref_corner):
    """Symbol dictionary + text region: the fixture encoder writes the
    Annex-A integer procedures and strip placement that jbig2enc-style
    files use; decode_embedded must reproduce the composited page over
    every reference corner and with multi-row strips (IAIT path)."""
    from dedoc_spark.core.jbig2 import encode_symbol_text

    glyphs, placements, expected = _glyphs_and_expected()
    stream = encode_symbol_text(
        glyphs, placements, 60, 24,
        log_strips=log_strips, ref_corner=ref_corner,
    )
    assert np.array_equal(decode_embedded(stream), expected)


def test_symbol_dict_in_globals_stream():
    """A dictionary carried in /JBIG2Globals must be visible to text
    regions in the page stream (cross-stream referred-to segments)."""
    from dedoc_spark.core.jbig2 import encode_symbol_text

    glyphs, placements, expected = _glyphs_and_expected()
    stream = encode_symbol_text(glyphs, placements, 60, 24)
    # split: page-info + symbol dict -> globals; text region -> page data
    off = 0
    segs = []
    for _ in range(3):
        # header: 4 num + 1 flags + 1 rts(+refs) + 1 page + 4 length
        p = off + 5
        nrefs = stream[p] >> 5
        p += 1 + nrefs
        p += 1  # page assoc
        length = int.from_bytes(stream[p : p + 4], "big")
        p += 4
        segs.append(stream[off : p + length])
        off = p + length
    assert off == len(stream)
    out = decode_embedded(segs[2], globals_data=segs[0] + segs[1])
    assert np.array_equal(out, expected)


def test_single_symbol_code_len_zero():
    """n=1 symbols -> IAID code length 0 (no bits per id)."""
    from dedoc_spark.core.jbig2 import encode_symbol_text

    glyph = _rand_bits(31, (6, 6), p=0.5)
    stream = encode_symbol_text([glyph], [(0, 1, 1), (0, 10, 3)], 20, 12)
    page = decode_embedded(stream)
    expected = np.zeros((12, 20), np.uint8)
    expected[1:7, 1:7] |= glyph
    expected[3:9, 10:16] |= glyph
    assert np.array_equal(page, expected)


def test_int_coder_roundtrip():
    """Annex-A integer procedures over every range bucket + OOB."""
    from dedoc_spark.core.jbig2 import (
        IntCtx, OOB, decode_int, encode_int,
    )

    values = [0, 1, -1, 3, 4, -4, 19, 20, -20, 83, 84, 339, 340,
              4435, 4436, 100000, -100000, OOB, 0, OOB, -340]
    enc = MQEncoder()
    ctx = IntCtx()
    for v in values:
        encode_int(enc, ctx, v)
    dec = MQDecoder(enc.flush())
    ctx = IntCtx()
    out = [decode_int(dec, ctx) for _ in values]
    assert out == values


def test_embedded_pixel_budget():
    img = _rand_bits(2, (16, 16))
    with pytest.raises(Jbig2Error):
        decode_embedded(encode_embedded(img), max_pixels=100)


def test_decode_image_object_jbig2():
    """The PDF image-object route: 1=black bits come back as ink=0."""
    from dedoc_spark.core.ocr import _decode_image_object

    img = _rand_bits(3, (12, 20))
    data = encode_embedded(img)
    head = (
        "<< /Type /XObject /Subtype /Image /Width 20 /Height 12 "
        "/ColorSpace /DeviceGray /BitsPerComponent 1 "
        f"/Filter /JBIG2Decode /Length {len(data)} >>"
    ).encode()
    out = _decode_image_object(head + b"\nstream\n" + data + b"\nendstream")
    assert out is not None
    assert np.array_equal(out, np.where(img != 0, 0, 255).astype(np.uint8))


def test_scanned_pdf_jbig2_end_to_end():
    from dedoc_spark.core import scanfont
    from dedoc_spark.core.document import extract_document
    from dedoc_spark.sources.pdf_fixture import build_scanned_pdf

    raster = scanfont.render_scan_page(["Jbig two scan line"], scale=2)
    for f in ("jbig2", "jbig2_mmr", "jbig2_sym"):
        pdf = build_scanned_pdf([raster], image_filter=f)
        d = extract_document(
            "scan.pdf", pdf, None, params={"pdf_with_text_layer": "false"}
        )
        assert d.get("error") is None, f
        assert "Jbig two scan line" in d["text_extracted"], f


# --- adversarial-input hardening (r6 review batch) ---------------------------

import struct

from dedoc_spark.core.jbig2 import (
    IntCtx,
    OOB,
    _NOMINAL_AT,
    decode_int,
    decode_symbol_dict,
    decode_text_region,
    encode_int,
)


def _seg(number, seg_type, refs, payload):
    hdr = struct.pack(">IB", number, seg_type)
    hdr += bytes([len(refs) << 5]) + bytes(refs)
    hdr += b"\x01" + struct.pack(">I", len(payload))
    return hdr + payload


_PAGE_INFO = struct.pack(">IIII", 8, 8, 0, 0) + b"\x00" + struct.pack(">H", 0)


def test_truncated_symbol_dict_is_typed_error():
    """struct underflow in a 3-byte dictionary payload must surface as
    Jbig2Error (the caller's skip channel), never struct.error."""
    stream = _seg(0, 48, [], _PAGE_INFO) + _seg(1, 0, [], b"\x00\x00\x00")
    with pytest.raises(Jbig2Error):
        decode_embedded(stream)


def test_truncated_text_region_is_typed_error():
    """A 19-byte text-region payload passes the length check but the
    SBNUMINSTANCES u32 reads past the end — typed, not struct.error."""
    tr = struct.pack(">IIII", 4, 4, 0, 0) + b"\x00" + struct.pack(">H", 0)
    assert len(tr) == 19
    stream = _seg(0, 48, [], _PAGE_INFO) + _seg(1, 6, [], tr)
    with pytest.raises(Jbig2Error):
        decode_embedded(stream)


def _dict_payload(body, num_ex=1, num_new=1):
    at = _NOMINAL_AT[0]
    return (
        struct.pack(">H", 0)
        + b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
        + struct.pack(">II", num_ex, num_new)
        + body
    )


def test_symbol_dict_respects_pixel_budget():
    """Symbol bitmaps are decoded by a per-pixel Python loop, so the
    max_pixels CPU valve must bound their cumulative area too — a
    declared 300x300 glyph must refuse under a 1000-pixel budget."""
    enc = MQEncoder()
    iadh, iadw = IntCtx(), IntCtx()
    encode_int(enc, iadh, 300)
    encode_int(enc, iadw, 300)
    payload = _dict_payload(enc.flush())
    with pytest.raises(Jbig2Error, match="pixel budget"):
        decode_symbol_dict(payload, [], max_pixels=1000)


def test_symbol_dict_empty_height_classes_terminate():
    """Height classes that add no symbols must not loop forever (the MQ
    decoder never exhausts on 0xFF padding)."""
    enc = MQEncoder()
    iadh, iadw = IntCtx(), IntCtx()
    for _ in range(3):
        encode_int(enc, iadh, 1)
        encode_int(enc, iadw, OOB)
    payload = _dict_payload(enc.flush())
    with pytest.raises(Jbig2Error, match="no progress"):
        decode_symbol_dict(payload, [], max_pixels=1 << 20)


def test_symbol_dict_zero_export_runs_terminate():
    """Export runs of length 0 flip the skip/export phase without
    advancing — a run of zeros must raise, not spin."""
    glyph = _rand_bits(41, (3, 3), p=0.5)
    at = _NOMINAL_AT[0]
    enc = MQEncoder()
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    gb_icx = bytearray(1 << 16)
    gb_mps = bytearray(1 << 16)
    encode_int(enc, iadh, 3)
    encode_int(enc, iadw, 3)
    encode_generic(glyph, 0, at, encoder=enc, icx=gb_icx, mps=gb_mps)
    encode_int(enc, iadw, OOB)
    for _ in range(10):
        encode_int(enc, iaex, 0)
    payload = _dict_payload(enc.flush())
    with pytest.raises(Jbig2Error, match="no progress"):
        decode_symbol_dict(payload, [], max_pixels=1 << 20)


def test_text_region_implausible_instance_count():
    """SBNUMINSTANCES is a raw u32; more instances than region pixels is
    a crafted stream driving billions of placement iterations."""
    tr = (
        struct.pack(">IIII", 4, 4, 0, 0)
        + b"\x00"
        + struct.pack(">H", 0)
        + struct.pack(">I", 17)  # > 4*4
    )
    with pytest.raises(Jbig2Error, match="instance count"):
        decode_text_region(tr, [np.ones((1, 1), np.uint8)], max_pixels=1 << 24)


def test_symbol_dict_imported_context_raises():
    """T.88 7.4.3.1.1 bit 8 (bitmap coding context used) means the GB
    context comes from another dictionary — decoding with a fresh
    context yields silently wrong glyphs, so it must refuse."""
    with pytest.raises(Jbig2Error, match="context"):
        decode_symbol_dict(struct.pack(">H", 1 << 8), [])


def test_intermediate_region_types_raise():
    """Intermediate regions (types 4/36) feed refinement segments and
    must never be composited onto the page."""
    stream = bytearray(encode_embedded(_rand_bits(1, (8, 8))))
    off = 11 + 19 + 4
    assert stream[off] == 39
    stream[off] = 36  # intermediate generic region
    with pytest.raises(Jbig2Error):
        decode_embedded(bytes(stream))

    from dedoc_spark.core.jbig2 import encode_symbol_text

    glyphs, placements, _ = _glyphs_and_expected()
    sym = bytearray(encode_symbol_text(glyphs, placements, 60, 24))
    # text region is the third segment; walk two headers to find it
    off = 0
    for _ in range(2):
        p = off + 5
        nrefs = sym[p] >> 5
        p += 1 + nrefs + 1
        off = p + 4 + int.from_bytes(sym[p : p + 4], "big")
    assert sym[off + 4] == 6
    sym[off + 4] = 4  # intermediate text region
    with pytest.raises(Jbig2Error):
        decode_embedded(bytes(sym))


def test_blank_page_jbig2_sym_fixture():
    """An all-white page has no inked tiles; the symbol-coded fixture
    must still produce a valid PDF (blank-glyph fallback), matching the
    other filters' behavior."""
    from dedoc_spark.core.document import extract_document
    from dedoc_spark.sources.pdf_fixture import build_scanned_pdf

    blank = np.full((32, 32), 255, np.uint8)
    pdf = build_scanned_pdf([blank], image_filter="jbig2_sym")
    d = extract_document(
        "blank.pdf", pdf, None, params={"pdf_with_text_layer": "false"}
    )
    assert d.get("error") is None
