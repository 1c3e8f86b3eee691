"""Focused regression tests for the round-7 optimization work: each
rewritten operator internal is pinned against a straightforward
reference implementation or a defined invariant, so future edits can't
silently change behavior the bit-exact rewrites preserved."""

import numpy as np
import pandas as pd
import pytest


# --- RunLength encoder: run-list walker vs the original greedy scanner ------


def _runlength_greedy(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while j < n and (j + 1 >= n or data[j] != data[j + 1]) and j - i < 128:
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)
    return bytes(out)


def test_runlength_encode_matches_greedy_reference():
    from dedoc_spark.core.pdf_filters import runlength_decode, runlength_encode

    rng = np.random.default_rng(11)
    cases = [b"", b"\x00", b"ab", b"a" * 129, b"a" * 128, b"a" * 130, b"ab" * 200]
    for trial in range(120):
        n = int(rng.integers(0, 1500))
        style = trial % 4
        if style == 0:
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif style == 1:
            data = bytes(np.repeat(rng.integers(0, 3, max(n // 50, 1), dtype=np.uint8), 50)[:n])
        elif style == 2:
            data = bytes(np.repeat(rng.integers(0, 2, max(n // 200, 1), dtype=np.uint8), 200)[:n])
        else:
            data = bytes(rng.integers(0, 2, n, dtype=np.uint8))
        cases.append(data)
    for data in cases:
        enc = runlength_encode(data)
        assert enc == _runlength_greedy(data)
        assert runlength_decode(enc) == data


# --- LZW encoder: (prefix code, byte) automaton --------------------------------


def test_lzw_spec_example_and_clear_boundary():
    from dedoc_spark.core.pdf_filters import lzw_decode, lzw_encode

    # PDF 32000-1:2008 §7.4.4.2 worked example
    assert lzw_encode(bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])).hex() == \
        "800b6050220c0c8501"
    # long repetitive stream crosses the 12-bit table Clear boundary
    data = bytes(np.repeat(np.arange(8, dtype=np.uint8), 2000))
    assert lzw_decode(lzw_encode(data)) == data


# --- glyph matcher: deterministic pixel-twin tie order -------------------------


def test_match_band_ties_order_by_template_index():
    from dedoc_spark.core.glyph_ocr import GRID, GlyphBank, _match_band

    rng = np.random.default_rng(5)
    g_dup = rng.integers(0, 256, GRID * GRID).tolist()
    templates = []
    for i in range(300):
        if i in (40, 170, 260):  # three pixel-twin copies of one glyph
            g = list(g_dup)
        else:
            g = rng.integers(0, 256, GRID * GRID).tolist()
        templates.append({"c": chr(ord("a") + i % 26), "g": g, "a": 1.0,
                          "h": 0.7, "d": 0.0})
    bank = GlyphBank({"grid": GRID, "templates": templates})
    crop = np.array(g_dup, dtype=np.float64).reshape(GRID, GRID) / 255.0
    crops = [crop] * 4
    boxes = [(i * 20, 0, i * 20 + GRID, GRID) for i in range(4)]
    idx, dist, _ = _match_band(bank, crops, boxes, topk=5)
    for row_i, row_d in zip(idx, dist):
        # the three exact twins come first, in ascending template index
        assert list(row_i[:3]) == [40, 170, 260]
        assert row_d[0] == row_d[1] == row_d[2]


# --- txt-layer feature extractor: table-driven rewrite pinned ------------------


def test_feature_dicts_pinned_values():
    from dedoc_spark.operators.classifier import _feature_dicts

    texts = ["", " ", "aA", "Hello Мир 123 [ok]? \x1f", "ё" * 7 + "\U0001d11e"]
    rows = _feature_dicts(pd.Series(texts))
    # empty text: all-zero proportions, NaN word stats (documented divergence)
    assert rows[0]["letters_proportion"] == 0.0
    assert np.isnan(rows[0]["mean_word_length"])
    assert rows[0]["std_char_ord"] == 0.0
    # "aA": one lower->upper transition over denom 2
    assert rows[2]["case_changes"] == 0.5
    assert rows[2]["letters_proportion"] == 1.0
    assert rows[2]["a_proportion"] == 0.5
    assert rows[2]["A_proportion"] == 0.5
    # mixed text: counts stay integers, ordinal stats match a direct compute
    t = texts[3]
    ords = [ord(c) for c in t]
    assert rows[3]["trash_chars_number"] == sum(
        1 for o in ords if o <= 32 or 160 <= o <= 879
    )
    assert rows[3]["mean_char_ord"] == pytest.approx(float(np.mean(ords)), abs=0)
    assert rows[3]["symbol0_number"] == 1  # '[' remapped name
    # astral char (surrogate-free codepoint view) + high Cyrillic
    t = texts[4]
    assert rows[4]["median_char_ord"] == float(np.median([ord(c) for c in t]))
    assert rows[4]["rus_proportion"] == 7 / 8


# --- CCITT: batched per-row transitions ----------------------------------------


def test_all_transitions_matches_per_row():
    from dedoc_spark.core.ccitt import _all_transitions, _transitions

    rng = np.random.default_rng(3)
    for _ in range(20):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 120))
        img = np.where(rng.random((h, w)) < 0.3, 0, 255).astype(np.uint8)
        batched = _all_transitions(img)
        for y in range(h):
            assert batched[y] == _transitions(img[y])


# --- JBIG2: blank-stretch batching around renorm/ink boundaries ----------------


def test_jbig2_blank_stretch_roundtrip():
    from dedoc_spark.core.jbig2 import decode_generic, encode_generic

    rng = np.random.default_rng(9)
    # wide blank page with sparse ink islands — exercises the run skip,
    # the window rebuild at ink boundaries, and renorm-in-gap steps
    bm = np.zeros((64, 500), dtype=np.uint8)
    for _ in range(25):
        y, x = int(rng.integers(0, 60)), int(rng.integers(0, 490))
        bm[y : y + int(rng.integers(1, 4)), x : x + int(rng.integers(1, 8))] = 1
    data = encode_generic(bm)
    out = decode_generic(data, 500, 64)
    assert np.array_equal(out, bm)
    # fully blank and fully black edge cases
    for fill in (0, 1):
        bm2 = np.full((16, 300), fill, dtype=np.uint8)
        assert np.array_equal(decode_generic(encode_generic(bm2), 300, 16), bm2)
