"""HEIC / AVIF decode via the SYSTEM libheif shared library (ctypes,
stdlib only — no new packages; same pattern as core/webp_decode). The
reference's PIL-based image set predates these formats, so this is a
beyond-reference capability for the web-scale multimodal channel:
phone cameras emit HEIC, modern crawls increasingly carry AVIF, and
this container ships libheif.so.1 with both an HEVC (libde265/x265)
and an AV1 (dav1d/aom) codec pair.

libheif's C API is opaque-pointer based — the only by-value struct is
``heif_error`` (code, subcode, message), which ctypes models directly —
so the binding is layout-stable across library versions.

Availability is a runtime property: every entry point raises a typed
:class:`ValueError` when the library is absent, which callers
(decode_image -> multimodal channel / scanned-image route) turn into
the same ``needs_decoder:image/heif|avif`` row — default output bytes
never depend on the library being present.

``encode_heif`` is the fixture instrument (chroma 4:4:4 + lossless
mode: pixels survive within the ±1 limited-range YCbCr rounding, so
tests assert near-equality and OCR rasters pass through cleanly).
"""

from __future__ import annotations

import ctypes
import os
import tempfile
from typing import Optional, Tuple

import numpy as np

_MAX_PIXELS = 1 << 26  # 64 Mpx allocation guard

_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHANNEL_INTERLEAVED = 10
COMPRESSION_HEVC = 1  # .heic
COMPRESSION_AV1 = 4  # .avif

# still-image ISO-BMFF brands this module owns (formats._FTYP_BRANDS
# routes them; mp4/quicktime movie brands stay on the video channel)
_IMAGE_BRANDS = (
    b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx",
    b"mif1", b"msf1", b"avif", b"avis",
)


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    for name in ("libheif.so.1", "libheif.so", "libheif.1.dylib", "libheif.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        P = ctypes.c_void_p
        try:
            for fname, res, args in (
                ("heif_context_alloc", P, []),
                ("heif_context_free", None, [P]),
                ("heif_context_read_from_memory_without_copy", _HeifError,
                 [P, ctypes.c_char_p, ctypes.c_size_t, P]),
                ("heif_context_get_primary_image_handle", _HeifError,
                 [P, ctypes.POINTER(P)]),
                ("heif_image_handle_get_width", ctypes.c_int, [P]),
                ("heif_image_handle_get_height", ctypes.c_int, [P]),
                ("heif_image_handle_release", None, [P]),
                ("heif_decode_image", _HeifError,
                 [P, ctypes.POINTER(P), ctypes.c_int, ctypes.c_int, P]),
                ("heif_image_get_plane_readonly", ctypes.POINTER(ctypes.c_uint8),
                 [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
                ("heif_image_get_width", ctypes.c_int, [P, ctypes.c_int]),
                ("heif_image_get_height", ctypes.c_int, [P, ctypes.c_int]),
                ("heif_image_release", None, [P]),
                ("heif_context_get_encoder_for_format", _HeifError,
                 [P, ctypes.c_int, ctypes.POINTER(P)]),
                ("heif_encoder_release", None, [P]),
                ("heif_encoder_set_lossless", _HeifError, [P, ctypes.c_int]),
                ("heif_encoder_set_parameter_string", _HeifError,
                 [P, ctypes.c_char_p, ctypes.c_char_p]),
                ("heif_image_create", _HeifError,
                 [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                  ctypes.POINTER(P)]),
                ("heif_image_add_plane", _HeifError,
                 [P, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]),
                ("heif_image_get_plane", ctypes.POINTER(ctypes.c_uint8),
                 [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
                ("heif_context_encode_image", _HeifError,
                 [P, P, P, P, ctypes.POINTER(P)]),
                ("heif_context_write_to_file", _HeifError, [P, ctypes.c_char_p]),
            ):
                f = getattr(lib, fname)
                f.restype = res
                f.argtypes = args
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def heif_available() -> bool:
    """True when the system libheif is loadable (tests gate on this)."""
    return _load() is not None


def is_heif(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp" and data[8:12] in _IMAGE_BRANDS


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode("latin-1", "replace")
        raise ValueError(f"heif: {what} failed ({err.code}/{err.subcode} {msg})")


def decode_heif(data: bytes) -> Tuple[int, int, np.ndarray]:
    """HEIC/AVIF bytes -> (width, height, HxWx3 uint8 RGB)."""
    lib = _load()
    if lib is None:
        raise ValueError("heif: system libheif unavailable")
    if not is_heif(data):
        raise ValueError("heif: not an ISO-BMFF still image")
    P = ctypes.c_void_p
    ctx = lib.heif_context_alloc()
    handle = P()
    img = P()
    try:
        _check(
            lib.heif_context_read_from_memory_without_copy(ctx, data, len(data), None),
            "read",
        )
        _check(
            lib.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle)),
            "primary handle",
        )
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            raise ValueError(f"heif: bad dimensions {w}x{h}")
        _check(
            lib.heif_decode_image(
                handle, ctypes.byref(img),
                _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB, None,
            ),
            "decode",
        )
        # size the numpy view by the DECODED image, not the handle's
        # ispe box — a crafted file can advertise dimensions larger than
        # the coded frame, and reading handle-sized rows would run past
        # the allocated plane
        dw = lib.heif_image_get_width(img, _CHANNEL_INTERLEAVED)
        dh = lib.heif_image_get_height(img, _CHANNEL_INTERLEAVED)
        if dw < w or dh < h:
            raise ValueError(f"heif: decoded frame {dw}x{dh} smaller than declared {w}x{h}")
        stride = ctypes.c_int(0)
        ptr = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride)
        )
        if not ptr or stride.value < w * 3:
            raise ValueError("heif: no interleaved plane")
        arr = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
        return w, h, arr[:, : w * 3].reshape(h, w, 3).copy()
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def encode_heif(rgb: np.ndarray, compression: int = COMPRESSION_AV1) -> bytes:
    """HxWx3 uint8 RGB -> HEIC (COMPRESSION_HEVC) or AVIF
    (COMPRESSION_AV1) bytes. Fixture instrument: lossless mode with
    chroma 4:4:4, pixels survive within ±1 (limited-range YCbCr
    rounding). Writes through a temp file because heif_writer's
    by-value-struct callback is the one ABI shape ctypes handles
    unevenly across platforms."""
    lib = _load()
    if lib is None:
        raise ValueError("heif: system libheif unavailable")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("heif: encoder wants HxWx3 RGB")
    h, w = rgb.shape[:2]
    P = ctypes.c_void_p
    ctx = lib.heif_context_alloc()
    enc = P()
    img = P()
    path = None
    try:
        _check(
            lib.heif_context_get_encoder_for_format(ctx, compression, ctypes.byref(enc)),
            "get encoder",
        )
        _check(lib.heif_encoder_set_lossless(enc, 1), "set lossless")
        _check(
            lib.heif_encoder_set_parameter_string(enc, b"chroma", b"444"),
            "set chroma",
        )
        _check(
            lib.heif_image_create(
                w, h, _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB, ctypes.byref(img)
            ),
            "image create",
        )
        _check(
            lib.heif_image_add_plane(img, _CHANNEL_INTERLEAVED, w, h, 8), "add plane"
        )
        stride = ctypes.c_int(0)
        ptr = lib.heif_image_get_plane(img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        if not ptr or stride.value < w * 3:
            raise ValueError("heif: no encoder plane")
        buf = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
        buf[:, : w * 3] = rgb.reshape(h, w * 3)
        _check(lib.heif_context_encode_image(ctx, img, enc, None, None), "encode")
        fd, path = tempfile.mkstemp(suffix=".heif")
        os.close(fd)
        _check(lib.heif_context_write_to_file(ctx, path.encode()), "write")
        with open(path, "rb") as f:
            return f.read()
    finally:
        if path:
            try:
                os.unlink(path)
            except OSError:
                pass
        if img:
            lib.heif_image_release(img)
        if enc:
            lib.heif_encoder_release(enc)
        lib.heif_context_free(ctx)
