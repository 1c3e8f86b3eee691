"""FreeType glyph rendering via the SYSTEM libfreetype (ctypes, stdlib
only — same pattern as core/webp_decode / core/heif_decode). Two jobs:

* BUILD-TIME instrument: scripts/build_glyph_bank.py renders the
  language charsets across the container's DejaVu faces into the
  committed glyph-template bank that core/glyph_ocr.py matches against
  (workers only load the bank — FreeType is NOT needed at run time).
* TEST fixture: render realistic anti-aliased, proportional text pages
  (unlike core/scanfont's procedural fixed-pitch font) to exercise the
  real-font OCR path the way real scans look.

The ctypes structs below are FreeType 2's PUBLIC ABI (frozen layouts:
FT_FaceRec / FT_GlyphSlotRec prefixes through ``bitmap_top``), verified
against libfreetype 2.12 by rendering known glyphs.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

_FT_LOAD_RENDER = 4

_FONT_DIRS = (
    "/usr/share/fonts/truetype/dejavu",
    "/usr/share/fonts/TTF",
    "/usr/share/fonts/dejavu",
)

# face key -> filename (resolved against _FONT_DIRS); the bank builder
# renders all of these, fixtures pick one
FACE_FILES: Dict[str, str] = {
    "serif": "DejaVuSerif.ttf",
    "serif-bold": "DejaVuSerif-Bold.ttf",
    "sans": "DejaVuSans.ttf",
    "sans-bold": "DejaVuSans-Bold.ttf",
    "mono": "DejaVuSansMono.ttf",
    "mono-bold": "DejaVuSansMono-Bold.ttf",
}


class _FTGeneric(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("finalizer", ctypes.c_void_p)]


class _FTBBox(ctypes.Structure):
    _fields_ = [(n, ctypes.c_long) for n in ("xMin", "yMin", "xMax", "yMax")]


class _FTGlyphMetrics(ctypes.Structure):
    _fields_ = [
        (n, ctypes.c_long)
        for n in (
            "width", "height", "horiBearingX", "horiBearingY", "horiAdvance",
            "vertBearingX", "vertBearingY", "vertAdvance",
        )
    ]


class _FTVector(ctypes.Structure):
    _fields_ = [("x", ctypes.c_long), ("y", ctypes.c_long)]


class _FTBitmap(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_uint), ("width", ctypes.c_uint),
        ("pitch", ctypes.c_int), ("buffer", ctypes.POINTER(ctypes.c_ubyte)),
        ("num_grays", ctypes.c_ushort), ("pixel_mode", ctypes.c_ubyte),
        ("palette_mode", ctypes.c_ubyte), ("palette", ctypes.c_void_p),
    ]


class _FTGlyphSlotRec(ctypes.Structure):
    _fields_ = [
        ("library", ctypes.c_void_p), ("face", ctypes.c_void_p),
        ("next", ctypes.c_void_p), ("glyph_index", ctypes.c_uint),
        ("generic", _FTGeneric),
        ("metrics", _FTGlyphMetrics),
        ("linearHoriAdvance", ctypes.c_long), ("linearVertAdvance", ctypes.c_long),
        ("advance", _FTVector),
        ("format", ctypes.c_int),
        ("bitmap", _FTBitmap),
        ("bitmap_left", ctypes.c_int), ("bitmap_top", ctypes.c_int),
    ]


class _FTFaceRec(ctypes.Structure):
    _fields_ = [
        ("num_faces", ctypes.c_long), ("face_index", ctypes.c_long),
        ("face_flags", ctypes.c_long), ("style_flags", ctypes.c_long),
        ("num_glyphs", ctypes.c_long),
        ("family_name", ctypes.c_char_p), ("style_name", ctypes.c_char_p),
        ("num_fixed_sizes", ctypes.c_int), ("available_sizes", ctypes.c_void_p),
        ("num_charmaps", ctypes.c_int), ("charmaps", ctypes.c_void_p),
        ("generic", _FTGeneric),
        ("bbox", _FTBBox),
        ("units_per_EM", ctypes.c_ushort),
        ("ascender", ctypes.c_short), ("descender", ctypes.c_short),
        ("height", ctypes.c_short),
        ("max_advance_width", ctypes.c_short), ("max_advance_height", ctypes.c_short),
        ("underline_position", ctypes.c_short), ("underline_thickness", ctypes.c_short),
        ("glyph", ctypes.POINTER(_FTGlyphSlotRec)),
        ("size", ctypes.c_void_p), ("charmap", ctypes.c_void_p),
    ]


_ft: Optional[ctypes.CDLL] = None
_ft_lib: Optional[ctypes.c_void_p] = None
_ft_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _ft, _ft_lib, _ft_tried
    if _ft_tried:
        return _ft
    _ft_tried = True
    for name in ("libfreetype.so.6", "libfreetype.so", "libfreetype.6.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        handle = ctypes.c_void_p()
        if lib.FT_Init_FreeType(ctypes.byref(handle)) != 0:
            continue
        _ft = lib
        _ft_lib = handle
        break
    return _ft


def find_font(key_or_path: str) -> Optional[str]:
    """Resolve a FACE_FILES key (or literal path) to an existing file."""
    import os

    if "/" in key_or_path:
        return key_or_path if os.path.exists(key_or_path) else None
    fname = FACE_FILES.get(key_or_path, key_or_path)
    for d in _FONT_DIRS:
        path = f"{d}/{fname}"
        if os.path.exists(path):
            return path
    return None


def ft_available(face: str = "serif") -> bool:
    return _load() is not None and find_font(face) is not None


_face_cache: Dict[Tuple[str, int], "FtFace"] = {}


def get_face(face: str, px: int) -> "FtFace":
    """Process-cached FtFace: FT_New_Face allocates a native face that
    this module never frees, so per-call construction would leak in
    long-lived workers (one render per corpus row). The cache is
    bounded by the handful of (face, px) combinations in use."""
    key = (face, px)
    hit = _face_cache.get(key)
    if hit is None:
        hit = _face_cache[key] = FtFace(face, px)
    return hit


class FtFace:
    """One (font file, pixel size) renderer; glyphs are cached."""

    def __init__(self, face: str, px: int) -> None:
        lib = _load()
        path = find_font(face)
        if lib is None or path is None:
            raise ValueError("freetype: library or font unavailable")
        self._lib = lib
        fp = ctypes.POINTER(_FTFaceRec)()
        if lib.FT_New_Face(_ft_lib, path.encode(), 0, ctypes.byref(fp)) != 0:
            raise ValueError(f"freetype: cannot open {path}")
        if lib.FT_Set_Pixel_Sizes(fp, 0, px) != 0:
            raise ValueError("freetype: cannot set pixel size")
        self._face = fp
        self.px = px
        rec = fp.contents
        upem = rec.units_per_EM or 2048
        self.ascender_px = rec.ascender * px / upem
        self.descender_px = -rec.descender * px / upem  # positive
        self._cache: Dict[str, Tuple[np.ndarray, int, int, float]] = {}

    def render(self, ch: str) -> Tuple[np.ndarray, int, int, float]:
        """char -> (gray coverage HxW uint8 (0 empty, 255 full ink),
        bitmap_left, bitmap_top (rows above baseline), advance px)."""
        hit = self._cache.get(ch)
        if hit is not None:
            return hit
        if self._lib.FT_Load_Char(self._face, ord(ch), _FT_LOAD_RENDER) != 0:
            raise ValueError(f"freetype: cannot render {ch!r}")
        g = self._face.contents.glyph.contents
        bm = g.bitmap
        if bm.rows and bm.width:
            arr = np.ctypeslib.as_array(bm.buffer, shape=(bm.rows, abs(bm.pitch)))
            arr = arr[:, : bm.width].copy()
        else:
            arr = np.zeros((0, 0), dtype=np.uint8)
        out = (arr, g.bitmap_left, g.bitmap_top, g.advance.x / 64.0)
        self._cache[ch] = out
        return out


def render_text_page(
    lines: List[str],
    face: str = "serif",
    px: int = 18,
    margin: int = 8,
    line_gap: Optional[int] = None,
) -> np.ndarray:
    """Anti-aliased text page -> HxW uint8 grayscale (255 paper, 0 ink).
    Simple left-to-right advance layout (no kerning — deterministic)."""
    f = get_face(face, px)
    asc = int(np.ceil(f.ascender_px))
    desc = int(np.ceil(f.descender_px))
    gap = line_gap if line_gap is not None else max(2, px // 3)
    line_h = asc + desc
    width = margin * 2 + max(
        (int(np.ceil(sum(f.render(ch)[3] for ch in line))) for line in lines if line),
        default=0,
    )
    height = margin * 2 + len(lines) * line_h + max(0, len(lines) - 1) * gap
    page = np.zeros((height, width), dtype=np.float64)
    y_base = margin + asc
    for line in lines:
        x = float(margin)
        for ch in line:
            bm, left, top, adv = f.render(ch)
            if bm.size:
                y0 = y_base - top
                x0 = int(round(x)) + left
                h, w = bm.shape
                y0c, x0c = max(0, y0), max(0, x0)
                y1c, x1c = min(height, y0 + h), min(width, x0 + w)
                if y0c < y1c and x0c < x1c:
                    page[y0c:y1c, x0c:x1c] = np.maximum(
                        page[y0c:y1c, x0c:x1c],
                        bm[y0c - y0 : y1c - y0, x0c - x0 : x1c - x0],
                    )
            x += adv
        y_base += line_h + gap
    return (255 - page).clip(0, 255).astype(np.uint8)
