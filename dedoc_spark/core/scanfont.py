"""Deterministic procedural bitmap font + scanned-page renderer.

This is the paired fixture half of the scanned-document (OCR) path in
core/ocr.py: ``render_scan_page`` draws text with a procedural 8x8
bitmap font, and the template-matching engine recognizes exactly that
font. The pair replaces the Tesseract runtime the reference shells out
to (pdf_image_reader/ocr/ocr_utils.py:16-46 ``pytesseract.image_to_data``)
with something this sandbox can run end-to-end and verify byte-for-byte
— a STAND-IN, never claimed as an OCR port: real scans need a real OCR
engine, which plugs into core/ocr.py via the ``recognize_page`` seam.

Font construction: every supported character gets an 8x8 glyph derived
from md5("glyph:<codepoint>") — a hash-ordered greedy pick of 24 of the
64 cells that guarantees every row AND every column of the glyph box
contains ink. The coverage guarantee is what makes segmentation exact:
a rendered line band is exactly 8*scale rows tall and every glyph box
exactly 8*scale columns wide, so band/run segmentation in the engine
recovers the layout with no heuristics. Glyph distinctness across the
full charset is asserted at import.

Layout model (all units = font cells, multiplied by ``scale`` pixels):
  glyph box 8x8, inter-char gap 2, space advance 10, inter-line gap 6.
So the blank gap between two glyphs inside a word is 2*scale columns and
between two words 12*scale columns — the engine splits words at 5*scale.

Bold = the glyph OR-ed with itself shifted one cell right (the classic
algorithmic emboldening), which thickens strokes exactly like a heavier
weight: the reference's stroke-width evaluation (bold_classifier.py:48-63)
separates the two variants.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

GLYPH = 8  # glyph box is GLYPH x GLYPH font cells
CHAR_ADV = 10  # glyph 8 + gap 2
SPACE_ADV = 10
LINE_ADV = 14  # glyph 8 + line gap 6
INK_CELLS = 24

# Language -> charset, mirroring the reference's language parameter values
# rus / eng / rus+eng (ocr_utils.py:10, api_args.py:31). Digits and ascii
# punctuation belong to both, like any Tesseract language pack.
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
_DIGITS = "0123456789"
_ENG_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_RUS_LETTERS = (
    "АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    "абвгдежзийклмнопрстуфхцчшщъыьэюя"
    "Ёё"
)

LANGUAGE_CHARSETS: Dict[str, str] = {
    "eng": _ENG_LETTERS + _DIGITS + _PUNCT,
    "rus": _RUS_LETTERS + _DIGITS + _PUNCT,
}


def charset_for_language(language: str) -> str:
    """``rus+eng`` (the reference default) unions the packs; unknown
    components are ignored; empty result falls back to rus+eng."""
    chars: List[str] = []
    seen = set()
    for part in str(language or "").split("+"):
        for ch in LANGUAGE_CHARSETS.get(part.strip().lower(), ""):
            if ch not in seen:
                seen.add(ch)
                chars.append(ch)
    if not chars:
        return charset_for_language("rus+eng")
    return "".join(chars)


def _glyph_bitmap(ch: str) -> np.ndarray:
    """8x8 bool glyph for one character, md5-derived (deterministic,
    content-only — no clock/uuid, per the repo invariant).

    Greedy pick over the hash-ordered cells: first take any cell whose
    row or column is still empty (guarantees full row/col coverage with
    at most 16 picks), then fill to INK_CELLS in hash order."""
    digest = b"".join(
        hashlib.md5(f"glyph:{ord(ch)}:{i}".encode()).digest() for i in range(4)
    )
    weights = np.frombuffer(digest, dtype=np.uint8).astype(np.int64)
    # stable order: weight, then cell index
    order = np.lexsort((np.arange(64), weights))
    bitmap = np.zeros((GLYPH, GLYPH), dtype=bool)
    rows_left = set(range(GLYPH))
    cols_left = set(range(GLYPH))
    chosen: List[int] = []
    for cell in order:
        r, c = divmod(int(cell), GLYPH)
        if r in rows_left or c in cols_left:
            chosen.append(int(cell))
            rows_left.discard(r)
            cols_left.discard(c)
        if not rows_left and not cols_left:
            break
    for cell in order:
        if len(chosen) >= INK_CELLS:
            break
        if int(cell) not in chosen:
            chosen.append(int(cell))
    for cell in chosen:
        r, c = divmod(cell, GLYPH)
        bitmap[r, c] = True
    return bitmap


def _bold_bitmap(bitmap: np.ndarray) -> np.ndarray:
    """Algorithmic emboldening: OR with a one-cell right shift (clipped)."""
    out = bitmap.copy()
    out[:, 1:] |= bitmap[:, :-1]
    return out


_FULL_CHARSET = charset_for_language("rus+eng")

GLYPHS: Dict[str, np.ndarray] = {ch: _glyph_bitmap(ch) for ch in _FULL_CHARSET}
BOLD_GLYPHS: Dict[str, np.ndarray] = {ch: _bold_bitmap(g) for ch, g in GLYPHS.items()}

# Distinctness guard: a hash collision (or a bold variant colliding with a
# different char's regular glyph) would make recognition ambiguous.
_keys = {g.tobytes() for g in GLYPHS.values()}
assert len(_keys) == len(GLYPHS), "procedural glyph collision"
_bold_keys = {g.tobytes() for g in BOLD_GLYPHS.values()}
assert len(_bold_keys) == len(BOLD_GLYPHS), "procedural bold glyph collision"
assert not (_keys & _bold_keys), "bold glyph collides with a regular glyph"


# A rendered line: either a plain string (no bold) or a list of
# (word, bold) pairs; words are joined with single spaces.
RenderLine = Union[str, Sequence[Tuple[str, bool]]]


def _line_words(line: RenderLine) -> List[Tuple[str, bool]]:
    if isinstance(line, str):
        return [(w, False) for w in line.split(" ") if w != ""]
    out: List[Tuple[str, bool]] = []
    for item in line:
        if isinstance(item, str):  # plain string inside a list: non-bold words
            out.extend((w, False) for w in item.split(" ") if w != "")
        else:
            w, b = item
            if w != "":
                out.append((w, bool(b)))
    return out


def render_scan_page(
    lines: Sequence[RenderLine],
    scale: int = 2,
    margin_cells: int = 4,
    rotate: int = 0,
    columns: Optional[Sequence[Sequence[RenderLine]]] = None,
    gutter_cells: int = 24,
    ink: int = 0,
    paper: int = 255,
) -> np.ndarray:
    """Render a synthetic scanned page, uint8 grayscale (paper=255, ink=0).

    ``lines``: top-down rendered one per band. Two-column pages pass
    ``columns=[left_lines, right_lines]`` instead (``lines`` ignored);
    the columns are separated by a ``gutter_cells``-wide blank gutter.
    ``rotate``: 0/90/180/270 — the page is rotated clockwise AFTER
    rendering (so the orientation detector has to undo it).
    """
    if columns is not None:
        blocks = [_render_block(list(col), scale) for col in columns]
        height = max(b.shape[0] for b in blocks)
        padded = []
        for b in blocks:
            if b.shape[0] < height:
                b = np.pad(b, ((0, height - b.shape[0]), (0, 0)))
            padded.append(b)
        gutter = np.zeros((height, gutter_cells * scale), dtype=bool)
        mask = padded[0]
        for b in padded[1:]:
            mask = np.concatenate([mask, gutter, b], axis=1)
    else:
        mask = _render_block(list(lines), scale)
    m = margin_cells * scale
    mask = np.pad(mask, ((m, m), (m, m)))
    page = np.where(mask, np.uint8(ink), np.uint8(paper))
    if rotate % 360:
        # np.rot90 is counter-clockwise; clockwise rotate = k=-1
        page = np.rot90(page, -((rotate % 360) // 90))
    return np.ascontiguousarray(page)


def _render_block(lines: List[RenderLine], scale: int) -> np.ndarray:
    """Ink mask (bool) for a block of lines, no margins."""
    parsed = [_line_words(ln) for ln in lines]
    widths = []
    for words in parsed:
        w = 0
        for i, (word, _) in enumerate(words):
            if i > 0:
                w += SPACE_ADV
            w += CHAR_ADV * len(word)
        # the trailing 2-cell gap of the last glyph is not drawn
        widths.append(max(0, w - (CHAR_ADV - GLYPH)) if words else 0)
    width = max(widths) if widths else 0
    height = len(parsed) * LINE_ADV - (LINE_ADV - GLYPH) if parsed else 0
    mask = np.zeros((max(height, 1) * scale, max(width, 1) * scale), dtype=bool)
    y = 0
    for words in parsed:
        x = 0
        for i, (word, bold) in enumerate(words):
            if i > 0:
                x += SPACE_ADV
            for ch in word:
                glyph = (BOLD_GLYPHS if bold else GLYPHS).get(ch)
                if glyph is not None:
                    block = np.kron(glyph, np.ones((scale, scale), dtype=bool))
                    mask[
                        y * scale : (y + GLYPH) * scale,
                        x * scale : (x + GLYPH) * scale,
                    ] |= block
                x += CHAR_ADV
        y += LINE_ADV
    return mask


def render_table_page(
    cell_texts: Sequence[Sequence[Optional[str]]],
    scale: int = 2,
    body_lines: Sequence[RenderLine] = ("page body line",),
    margin_cells: int = 5,
) -> np.ndarray:
    """Body lines + an N x M ruled grid below them — the scanned-table
    fixture paired with ocr.recognize_tables_from_image (the pixel-rule
    analogue of the reference's table_recognizer input). Cells are
    90 x 24 font cells; a ``None`` cell stays empty."""
    n_rows, n_cols = len(cell_texts), len(cell_texts[0])
    cell_w, cell_h = 90 * scale, 24 * scale
    x0, y0 = 10, 80 * scale
    body = render_scan_page(list(body_lines), scale=scale, margin_cells=margin_cells)
    h = max(body.shape[0], y0 + n_rows * cell_h + 20)
    w = max(body.shape[1], x0 + n_cols * cell_w + 20)
    canvas = np.full((h, w), 255, dtype=np.uint8)
    canvas[: body.shape[0], : body.shape[1]] = body
    for r in range(n_rows + 1):
        canvas[y0 + r * cell_h, x0 : x0 + n_cols * cell_w + 1] = 0
    for c in range(n_cols + 1):
        canvas[y0 : y0 + n_rows * cell_h + 1, x0 + c * cell_w] = 0
    for r, row in enumerate(cell_texts):
        for c, text in enumerate(row):
            if text is None:
                continue
            block = render_scan_page([text], scale=scale, margin_cells=0)
            y = y0 + r * cell_h + 6
            x = x0 + c * cell_w + 8
            canvas[y : y + block.shape[0], x : x + block.shape[1]] = np.minimum(
                canvas[y : y + block.shape[0], x : x + block.shape[1]], block
            )
    return canvas
