"""WebP decode via the SYSTEM libwebp shared library (ctypes, stdlib
only — no new packages). WebP is in the reference's accepted image set
(extensions.py:31 ".webp", mime "image/webp" at :50,:112; the scanned
corpus ships tests/data/scanned/example.webp), where PIL/cv2 decode it;
neither python binding lives in this container, but the container's
own ``libwebp.so.7`` does, so the binding keeps the capability without
a pure-python VP8 port (whose ~2k compiled-in probability constants
could not be validated here).

Availability is a runtime property: every entry point degrades to a
typed :class:`ValueError` when the library is absent, which callers
(decode_image -> the multimodal channel / scanned-image route) turn
into the same ``needs_decoder:image/webp`` row as before — default
output bytes do not depend on the library being present.

The encoder half (``encode_webp_lossless``) is the fixture instrument:
lossless VP8L round-trips are exact, so tests assert pixel equality.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_MAX_PIXELS = 1 << 26  # 64 Mpx allocation guard (same spirit as jbig2)

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPDecodeRGBInto.restype = ctypes.c_void_p
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPFree.restype = None
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def webp_available() -> bool:
    """True when the system libwebp is loadable (tests gate on this)."""
    return _load() is not None


def is_webp(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WEBP"


def decode_webp(data: bytes) -> Tuple[int, int, np.ndarray]:
    """WebP bytes (VP8 lossy / VP8L lossless / VP8X extended) ->
    (width, height, HxWx3 uint8 RGB)."""
    lib = _load()
    if lib is None:
        raise ValueError("webp: system libwebp unavailable")
    if not is_webp(data):
        raise ValueError("webp: not a RIFF/WEBP container")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("webp: malformed header")
    width, height = w.value, h.value
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise ValueError(f"webp: bad dimensions {width}x{height}")
    stride = width * 3
    out = np.empty((height, stride), dtype=np.uint8)
    ret = lib.WebPDecodeRGBInto(
        data,
        len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes,
        stride,
    )
    if not ret:
        raise ValueError("webp: decode failed")
    return width, height, out.reshape(height, width, 3)


def encode_webp_lossless(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> lossless WebP bytes (fixture instrument;
    exact round-trip with decode_webp)."""
    lib = _load()
    if lib is None:
        raise ValueError("webp: system libwebp unavailable")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("webp: encoder wants HxWx3 RGB")
    h, w = rgb.shape[:2]
    out_ptr = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGB(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        w * 3,
        ctypes.byref(out_ptr),
    )
    if not size:
        raise ValueError("webp: encode failed")
    try:
        return ctypes.string_at(out_ptr, size)
    finally:
        lib.WebPFree(out_ptr)
