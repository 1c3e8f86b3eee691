"""Hand-built JPEG-with-EXIF fixture (no PIL/piexif in the container):
SOI + APP1("Exif\\0\\0" + little-endian TIFF with IFD0 and an Exif sub-IFD)
+ EOI. Only the segments the EXIF reader walks."""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

_TYPE_ASCII, _TYPE_SHORT, _TYPE_LONG = 2, 3, 4


def _build_ifd(entries: List[Tuple[int, int, bytes]], ifd_offset: int, extra_ptr: Optional[Tuple[int, int]] = None) -> Tuple[bytes, bytes]:
    """entries: (tag, type, payload bytes). Returns (ifd bytes, data area),
    with out-of-line values placed right after the IFD."""
    n = len(entries) + (1 if extra_ptr else 0)
    ifd_size = 2 + n * 12 + 4
    data_start = ifd_offset + ifd_size
    out = struct.pack("<H", n)
    data = b""
    items = list(entries)
    if extra_ptr:
        items.append((extra_ptr[0], _TYPE_LONG, struct.pack("<I", extra_ptr[1])))
    items.sort(key=lambda e: e[0])
    for tag, vtype, payload in items:
        count = len(payload) if vtype == _TYPE_ASCII else len(payload) // {_TYPE_SHORT: 2, _TYPE_LONG: 4}.get(vtype, 1)
        if len(payload) <= 4:
            out += struct.pack("<HHI", tag, vtype, count) + payload.ljust(4, b"\x00")
        else:
            out += struct.pack("<HHI", tag, vtype, count) + struct.pack("<I", data_start + len(data))
            data += payload
    out += struct.pack("<I", 0)  # next IFD
    return out, data


def build_jpeg_exif(fields: Optional[Dict[str, object]] = None) -> bytes:
    fields = fields or {}

    def ascii_z(s: str) -> bytes:
        return s.encode("latin-1") + b"\x00"

    exif_entries: List[Tuple[int, int, bytes]] = []
    if "ExifImageWidth" in fields:
        exif_entries.append((0xA002, _TYPE_LONG, struct.pack("<I", int(fields["ExifImageWidth"]))))
    if "ExifImageHeight" in fields:
        exif_entries.append((0xA003, _TYPE_LONG, struct.pack("<I", int(fields["ExifImageHeight"]))))
    if "DateTimeOriginal" in fields:
        exif_entries.append((0x9003, _TYPE_ASCII, ascii_z(str(fields["DateTimeOriginal"]))))

    ifd0_entries: List[Tuple[int, int, bytes]] = []
    for name, tag in (("Make", 0x010F), ("Model", 0x0110), ("Software", 0x0131), ("DateTime", 0x0132)):
        if name in fields:
            ifd0_entries.append((tag, _TYPE_ASCII, ascii_z(str(fields[name]))))
    if "Orientation" in fields:
        ifd0_entries.append((0x0112, _TYPE_SHORT, struct.pack("<H", int(fields["Orientation"]))))

    # layout: header(8) | IFD0 | ifd0 data | ExifIFD | exif data
    ifd0_offset = 8
    # two-pass: size IFD0 first with a dummy exif pointer
    dummy, d0 = _build_ifd(ifd0_entries, ifd0_offset, extra_ptr=(0x8769, 0))
    exif_offset = ifd0_offset + len(dummy) + len(d0)
    ifd0, data0 = _build_ifd(ifd0_entries, ifd0_offset, extra_ptr=(0x8769, exif_offset))
    exif_ifd, exif_data = _build_ifd(exif_entries, exif_offset)
    tiff = b"II" + struct.pack("<HI", 42, ifd0_offset) + ifd0 + data0 + exif_ifd + exif_data

    app1_body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    return b"\xff\xd8" + app1 + b"\xff\xd9"
