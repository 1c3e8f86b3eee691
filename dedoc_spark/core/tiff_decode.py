"""Baseline TIFF 6.0 decoder, pure Python + numpy — the container real
fax scans and office scanners ship in. The reference hands TIFF to
PIL/cv2 (it registers image_like .tiff, png_converter.py:16-39); neither
lives in this container, so the strip-based baseline subset decodes
natively here, reusing the codecs already built for PDF rasters:

  compression 1      uncompressed (1-bit bilevel, 8-bit gray, 8-bit RGB)
  compression 2      CCITT MH 1-D           (core/ccitt.decode_g3 k=0)
  compression 3      CCITT G3, T4Options    (core/ccitt.decode_g3)
  compression 4      CCITT G4               (core/ccitt.decode_g4)
  compression 5      LZW (TIFF == the PDF MSB-first early-change
                     stream) + Predictor 2  (core/pdf_filters.lzw_decode)
  compression 7      new-style JPEG strips, with or without the shared
                     JPEGTables tag  (core/jpeg_decode)
  compression 32773  PackBits

Both the STRIP organisation (RowsPerStrip/StripOffsets) and the TILE
organisation (TileWidth/TileLength/TileOffsets, TIFF 6.0 §15 — what
imaging libraries and GIS scanners emit for large pages) decode through
the same per-rectangle codec paths. BigTIFF (version 43, 8-byte
offsets) parses through the same IFD walk; 16-bit samples keep their
high byte (the pipeline is 8-bit); PlanarConfiguration 2 gathers the
per-sample strip planes.
FillOrder 2 (bit-reversed strips) is honored for fax codecs and 1-bit
byte-oriented strips; PhotometricInterpretation 1 inverts fax output
(BlackIsZero). Multi-page TIFFs
decode their first IFD (PIL's default frame — parity with the
reference's conversion); decode_tiff_pages returns every page for the
scanned-document route.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from dedoc_spark.core.ccitt import CcittError, decode_g3, decode_g4
from dedoc_spark.core.pdf_filters import PdfFilterError, lzw_decode

# byte-wise bit reversal for FillOrder 2
_BITREV = np.array(
    [int(f"{b:08b}"[::-1], 2) for b in range(256)], dtype=np.uint8
)


def _packbits(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9): n < 128 copies n+1 literals, n > 128
    repeats the next byte 257-n times, n == 128 is a NOP."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        code = data[i]
        i += 1
        if code == 128:
            continue
        if code < 128:
            out += data[i : i + code + 1]
            i += code + 1
        else:
            if i >= n:
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[i]]) * (257 - code)
            i += 1
    return bytes(out)


def _read_ifds(data: bytes) -> Tuple[str, List[Dict[int, Tuple[int, int, bytes, bool]]]]:
    """Classic (42) and BigTIFF (43, 8-byte offsets/counts — what
    scanners emit past the 4 GiB strip-offset ceiling) IFD chains.
    Each entry carries its own ``big`` flag so value readers need no
    extra plumbing."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (version,) = struct.unpack_from(bo + "H", data, 2)
    if version == 42:
        big = False
        (off,) = struct.unpack_from(bo + "I", data, 4)
    elif version == 43:
        osize, pad = struct.unpack_from(bo + "HH", data, 4)
        if osize != 8 or pad != 0:
            raise ValueError("tiff: bad BigTIFF header")
        big = True
        (off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        raise ValueError("not a TIFF")
    count_size, entry_size, raw_off = (8, 20, 12) if big else (2, 12, 8)
    # IFD entry-count field H/Q; per-entry value count LONG/LONG8
    cfmt, ecfmt, nfmt = ("Q", "Q", "Q") if big else ("H", "I", "I")
    ifds = []
    seen = set()
    while off and off not in seen and off + count_size <= len(data):
        seen.add(off)
        (count,) = struct.unpack_from(bo + cfmt, data, off)
        entries: Dict[int, Tuple[int, int, bytes, bool]] = {}
        for i in range(count):
            base = off + count_size + entry_size * i
            if base + entry_size > len(data):
                break
            tag, typ = struct.unpack_from(bo + "HH", data, base)
            (cnt,) = struct.unpack_from(bo + ecfmt, data, base + 4)
            entries[tag] = (typ, cnt, data[base + raw_off : base + entry_size], big)
        ifds.append(entries)
        nxt_pos = off + count_size + entry_size * count
        if nxt_pos + (8 if big else 4) > len(data):
            break
        (off,) = struct.unpack_from(bo + nfmt, data, nxt_pos)
    if not ifds:
        raise ValueError("tiff: no IFD")
    return bo, ifds


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 16: 8, 17: 8}


def _values(data: bytes, bo: str, entry: Tuple[int, int, bytes, bool]) -> List[int]:
    typ, cnt, raw, big = entry
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return []
    total = size * cnt
    inline = 8 if big else 4
    if total <= inline:
        buf = raw[:total]
    else:
        (ptr,) = struct.unpack_from(bo + ("Q" if big else "I"), raw, 0)
        buf = data[ptr : ptr + total]
    fmt = {
        1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
        16: "Q", 17: "q",
    }[typ]
    return list(struct.unpack(bo + fmt * cnt, buf[: size * cnt]))


def _decode_ifd(data: bytes, bo: str, ifd: Dict) -> np.ndarray:
    def tag(t: int, default: Optional[int] = None) -> Optional[int]:
        if t not in ifd:
            return default
        v = _values(data, bo, ifd[t])
        return v[0] if v else default

    width = tag(256)
    height = tag(257)
    if not width or not height:
        raise ValueError("tiff: missing dimensions")
    compression = tag(259, 1)
    photometric = tag(262, 1)
    spp = tag(277, 1)
    bits = _values(data, bo, ifd[258]) if 258 in ifd else [1]
    bps = bits[0] if bits else 1
    rows_per_strip = tag(278, height) or height
    fill_order = tag(266, 1)
    predictor = tag(317, 1)
    t4options = tag(292, 0)
    # JPEGTables (347, TIFF/EP): abbreviated DQT/DHT stream shared by all
    # strips — SOI + segments + EOI; each strip is SOI + frame/scan + EOI
    jpeg_tables = (
        bytes(_values(data, bo, ifd[347])) if 347 in ifd else b""
    )
    planar = tag(284, 1)

    def block(chunk: bytes, bw: int, rows: int, nsamples: Optional[int] = None) -> np.ndarray:
        """Decode one strip/tile rectangle -> (rows, bw, channels) uint8.
        Strips and tiles share every codec path (TIFF 6.0 §15: a tile is
        compressed exactly like a strip of TileLength rows).
        ``nsamples`` overrides samples-per-pixel for planar strips (each
        carries ONE sample plane)."""
        nspp = spp if nsamples is None else nsamples
        if compression in (2, 3, 4) and fill_order == 2:
            chunk = _BITREV[np.frombuffer(chunk, dtype=np.uint8)].tobytes()
        if compression in (2, 3, 4):
            try:
                if compression == 4:
                    img = decode_g4(chunk, bw, rows=rows)
                elif compression == 3:
                    two_d = bool(t4options & 1)
                    img = decode_g3(
                        chunk, bw, rows=rows, k=4 if two_d else 0,
                        byte_align=bool(t4options & 4),
                    )
                else:
                    # TIFF 6.0 §10: Modified Huffman rows are REQUIRED to
                    # begin on byte boundaries (libtiff FAXMODE_BYTEALIGN
                    # for COMPRESSION_CCITTRLE)
                    img = decode_g3(chunk, bw, rows=rows, k=0, byte_align=True)
            except CcittError as e:
                raise ValueError(f"tiff: fax strip decode failed ({e})")
            if img.shape[0] < rows:  # pad short strips white
                pad = np.full((rows - img.shape[0], bw), 255, np.uint8)
                img = np.vstack([img, pad])
            if photometric == 1:  # BlackIsZero fax: coded runs are inverted
                img = 255 - img
            return img[:, :, None]
        if compression == 7:  # new-style JPEG (TIFF/EP / TechNote 2)
            from dedoc_spark.core.jpeg_decode import decode_jpeg

            blob = chunk
            if jpeg_tables and chunk[:2] == b"\xff\xd8":
                blob = b"\xff\xd8" + jpeg_tables[2:-2] + chunk[2:]
            try:
                _, _, rgb = decode_jpeg(blob)
            except ValueError as e:
                raise ValueError(f"tiff: jpeg strip failed ({e})")
            if rgb.shape[1] < bw or rgb.shape[0] < rows:
                raise ValueError("tiff: jpeg strip smaller than declared")
            return rgb[:rows, :bw]  # crop MCU padding
        if compression == 5:
            try:
                chunk = lzw_decode(chunk, early_change=1)
            except PdfFilterError as e:
                raise ValueError(f"tiff: LZW strip failed ({e})")
        elif compression == 32773:
            chunk = _packbits(chunk)
        elif compression != 1:
            raise ValueError(f"tiff: unsupported compression {compression}")
        if bps == 1 and nspp == 1:
            stride = (bw + 7) // 8
            if fill_order == 2:  # pixel bits fill bytes LSB-first
                chunk = _BITREV[np.frombuffer(chunk, dtype=np.uint8)].tobytes()
            bitbuf = np.frombuffer(chunk[: stride * rows], dtype=np.uint8)
            if bitbuf.size < stride * rows:
                raise ValueError("tiff: short strip")
            px = np.unpackbits(bitbuf.reshape(rows, stride), axis=1)[:, :bw]
            if photometric == 1:  # BlackIsZero: 1 bits are white
                px = 1 - px
            return ((1 - px) * 255).astype(np.uint8)[:, :, None]
        if bps == 8:
            need = bw * rows * nspp
            arr = np.frombuffer(chunk[:need], dtype=np.uint8)
            if arr.size < need:
                raise ValueError("tiff: short strip")
            arr = arr.reshape(rows, bw, nspp).copy()
            if predictor == 2:
                arr = np.add.accumulate(arr, axis=1, dtype=np.uint8)
            if photometric == 0 and spp == 1:  # WhiteIsZero gray
                arr = 255 - arr
            return arr
        if bps == 16:
            # 16-bit samples (film/medical scanners): decode in the file's
            # byte order, apply the predictor at full width, keep the
            # high byte (the document pipeline is 8-bit)
            need = bw * rows * nspp * 2
            arr = np.frombuffer(chunk[:need], dtype=np.dtype(bo + "u2"))
            if arr.size < need // 2:
                raise ValueError("tiff: short strip")
            arr = arr.reshape(rows, bw, nspp).copy()
            if predictor == 2:
                arr = np.add.accumulate(arr, axis=1, dtype=np.uint16)
            out = (arr >> 8).astype(np.uint8)
            if photometric == 0 and spp == 1:  # WhiteIsZero gray
                out = 255 - out
            return out
        raise ValueError(f"tiff: unsupported bits-per-sample {bps}")

    tile_w = tag(322)
    tile_h = tag(323)
    if tile_w and tile_h:
        # tiled organisation (TIFF 6.0 §15): left-to-right, top-to-bottom
        # grid of FULL tile_w x tile_h rectangles (edge tiles are padded
        # in the data and cropped here)
        offsets = _values(data, bo, ifd[324]) if 324 in ifd else []
        counts = _values(data, bo, ifd[325]) if 325 in ifd else []
        if not offsets:
            raise ValueError("tiff: no tile offsets")
        if not counts:
            counts = [len(data) - offsets[0]]
        across = (width + tile_w - 1) // tile_w
        down = (height + tile_h - 1) // tile_h
        if len(offsets) < across * down:
            raise ValueError("tiff: missing tiles")
        img = None
        for ti in range(across * down):
            t = block(data[offsets[ti] : offsets[ti] + counts[ti]], tile_w, tile_h)
            if img is None:
                img = np.zeros((height, width, t.shape[2]), np.uint8)
            y0 = (ti // across) * tile_h
            x0 = (ti % across) * tile_w
            img[y0 : y0 + tile_h, x0 : x0 + tile_w] = t[
                : height - y0, : width - x0
            ]
    else:
        offsets = _values(data, bo, ifd[273]) if 273 in ifd else []
        counts = _values(data, bo, ifd[279]) if 279 in ifd else []
        if not offsets:
            raise ValueError("tiff: no strip offsets")
        if not counts:  # single strip to EOF (seen in the wild)
            counts = [len(data) - offsets[0]]
        if planar == 2 and spp > 1:
            # PlanarConfiguration 2: all strips of sample 0, then all of
            # sample 1, ... — each strip carries one sample plane
            if compression in (2, 3, 4, 7):
                raise ValueError("tiff: planar fax/jpeg unsupported")
            per_plane = (height + rows_per_strip - 1) // rows_per_strip
            if len(offsets) < per_plane * spp:
                raise ValueError("tiff: missing planar strips")
            chans = []
            for s in range(spp):
                planes: List[np.ndarray] = []
                row_cursor = 0
                for k in range(per_plane):
                    rows = min(rows_per_strip, height - row_cursor)
                    if rows <= 0:
                        break
                    soff = offsets[s * per_plane + k]
                    scnt = counts[s * per_plane + k]
                    planes.append(
                        block(data[soff : soff + scnt], width, rows, nsamples=1)
                    )
                    row_cursor += rows
                chans.append(np.vstack(planes)[:height])
            img = np.concatenate(chans, axis=2)
        else:
            planes = []
            row_cursor = 0
            for soff, scnt in zip(offsets, counts):
                rows = min(rows_per_strip, height - row_cursor)
                if rows <= 0:
                    break
                planes.append(block(data[soff : soff + scnt], width, rows))
                row_cursor += rows
            if not planes:
                raise ValueError("tiff: no strips decoded")
            img = np.vstack(planes)[:height]
    if img.shape[2] == 1:
        return np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


def decode_tiff(data: bytes) -> Tuple[int, int, np.ndarray]:
    """First page -> (width, height, HxWx3 uint8 RGB)."""
    bo, ifds = _read_ifds(data)
    rgb = _decode_ifd(data, bo, ifds[0])
    return rgb.shape[1], rgb.shape[0], rgb


def decode_tiff_pages(data: bytes) -> List[np.ndarray]:
    """Every IFD page as HxWx3 RGB (multi-page fax TIFFs); pages that
    fail to decode are skipped, never an exception for later pages."""
    bo, ifds = _read_ifds(data)
    out: List[np.ndarray] = []
    for ifd in ifds:
        try:
            out.append(_decode_ifd(data, bo, ifd))
        except ValueError:
            continue
    return out
