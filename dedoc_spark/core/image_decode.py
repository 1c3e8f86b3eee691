"""Real image/audio decoding, pure Python + numpy: PNG (zlib inflate +
scanline filter reversal), uncompressed BMP, GIF (LZW), baseline JPEG
(core/jpeg_decode) and WAV PCM. No PIL/cv2 — the reference shells any
image format through PIL/cv2
(converters/concrete_converters/png_converter.py:16-39); unsupported
variants (arithmetic-coded JPEG, compressed audio, video) land in the
pipeline's ``error`` column, never crash a task.

decode_image(data) -> (width, height, HxWx3 uint8 RGB array)

Supported:
  PNG  bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette),
       4 (gray+alpha), 6 (RGBA); interlace 0 and Adam7. Alpha is
       dropped (composited on black, matching a raw-pixel read).
  BMP  BITMAPINFOHEADER, uncompressed (BI_RGB) 24/32-bit, bottom-up or
       top-down rows.
  GIF  87a/89a first frame, interlaced or not (variable-width LZW).
  JPEG baseline/extended sequential AND progressive via core/jpeg_decode
       (Huffman + IDCT + YCbCr, 4:4:4/4:2:2/4:2:0, spectral selection +
       successive approximation).
  WAV  RIFF PCM audio via decode_audio/audio_features.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Optional, Tuple

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse per-scanline filters (PNG spec §6): each scanline is
    1 filter byte + stride data bytes."""
    out = bytearray(height * stride)
    prev_off = -1
    pos = 0
    for row in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        off = row * stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_off >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if prev_off >= 0 else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                c = out[prev_off + i - bpp] if (prev_off >= 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[off : off + stride] = line
        prev_off = off
    return out


def _decode_png(data: bytes) -> Tuple[int, int, np.ndarray]:
    pos = 8
    width = height = 0
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width == 0 or height == 0:
        raise ValueError("PNG missing IHDR")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError(f"PNG bit depth {bit_depth} with color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = (width * channels * bit_depth + 7) // 8
        if len(raw) < height * (stride + 1):
            raise ValueError("PNG pixel data truncated")
        flat = _png_unfilter(raw, height, stride, max(1, channels * bit_depth // 8))
        arr = _samples_from_rows(bytes(flat), height, width, channels, bit_depth)
    elif interlace == 1:
        arr = _deinterlace_adam7(raw, width, height, channels, bit_depth)
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if color_type == 0:
        if bit_depth < 8:
            # expand sub-byte gray to full range (255 / max sample)
            arr = arr * (255 // ((1 << bit_depth) - 1))
        rgb = np.repeat(arr, 3, axis=2)
    elif color_type == 2:
        rgb = arr
    elif color_type == 3:
        if not palette:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(palette.ljust(768, b"\x00"), dtype=np.uint8).reshape(256, 3)
        rgb = pal[arr[:, :, 0]]
    elif color_type == 4:
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
    else:  # 6 RGBA → drop alpha
        rgb = arr[:, :, :3]
    return width, height, np.ascontiguousarray(rgb)


def _samples_from_rows(
    flat: bytes, height: int, width: int, channels: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes -> (h, w, channels) uint8 samples.
    Depth 1/2/4 unpacks MSB-first packed samples (PNG spec §7.2);
    depth 16 keeps the high byte (the pipeline is 8-bit)."""
    stride = (width * channels * depth + 7) // 8
    rows = np.frombuffer(flat, dtype=np.uint8).reshape(height, stride)
    if depth == 8:
        return rows[:, : width * channels].reshape(height, width, channels)
    if depth == 16:
        wide = rows[:, : width * channels * 2].reshape(height, width * channels, 2)
        return wide[:, :, 0].reshape(height, width, channels).copy()
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : (stride * 8 // depth) * depth].reshape(height, -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    samples = (per * weights).sum(axis=2).astype(np.uint8)
    return samples[:, : width * channels].reshape(height, width, channels)


# Adam7 pass geometry: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _deinterlace_adam7(
    raw: bytes, width: int, height: int, channels: int, depth: int = 8
) -> np.ndarray:
    """Adam7: seven sub-images, each filtered independently, scattered back
    onto the full grid by the pass geometry."""
    out = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = (pw * channels * depth + 7) // 8
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("PNG pixel data truncated (interlaced)")
        flat = _png_unfilter(
            raw[pos : pos + need], ph, stride, max(1, channels * depth // 8)
        )
        pos += need
        out[y0::dy, x0::dx] = _samples_from_rows(bytes(flat), ph, pw, channels, depth)
    return out


def _decode_bmp(data: bytes) -> Tuple[int, int, np.ndarray]:
    if len(data) < 54:
        raise ValueError("BMP too short")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height_raw = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    height = abs(height_raw)
    bottom_up = height_raw > 0
    bytes_pp = bpp // 8
    row_size = (width * bytes_pp + 3) // 4 * 4
    need = pix_off + row_size * height
    if len(data) < need:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * height, offset=pix_off)
    rows = rows.reshape(height, row_size)[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        rows = rows[::-1]
    # BMP stores BGR(A)
    rgb = rows[:, :, 2::-1]
    return width, height, np.ascontiguousarray(rgb)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width from
    min_code_size+1 up to 12 bits, CLEAR resets the table, EOI ends."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list = []
    code_size = prev = 0

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        prev = -1

    reset()
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                reset()
                continue
            if code == eoi:
                return out
            if prev == -1:  # first code after reset
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW stream")
                out += table[code]
                prev = code
                continue
            if code < len(table):
                entry = table[code]
                table.append(table[prev] + entry[:1])
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
            prev = code
            if len(out) > max_pixels:  # hostile input: bounded output
                return out
    return out


def _decode_gif(data: bytes) -> Tuple[int, int, np.ndarray]:
    """First frame of a GIF87a/GIF89a: global/local color table, LZW
    indices → RGB (see decode_gif_frames for the full animation)."""
    for frame in decode_gif_frames(data, max_frames=1):
        return frame
    raise ValueError("GIF has no image data")


def decode_gif_frames(data: bytes, max_frames: Optional[int] = None):
    """All frames of an animated GIF as (width, height, rgb) tuples —
    the real decode behind the frame-sampling operator (each image
    descriptor block is one frame; graphic-control extensions are
    skipped like any extension; no inter-frame compositing — each frame
    is decoded standalone against its own color table)."""
    frames = []
    if len(data) < 13:
        raise ValueError("GIF too short")
    packed = data[10]
    gct_size = 2 << (packed & 0x07)
    pos = 13
    gct = b""
    if packed & 0x80:
        gct = data[pos : pos + gct_size * 3]
        pos += gct_size * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            width, height = struct.unpack_from("<HH", data, pos + 5)
            ipacked = data[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:  # local color table
                lct_size = 2 << (ipacked & 0x07)
                ct = data[pos : pos + lct_size * 3]
                pos += lct_size * 3
            if not ct:
                raise ValueError("GIF missing color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1  # skip the sub-block terminator (next frame follows)
            indices = _lzw_decode(bytes(lzw), min_code_size, width * height)
            if len(indices) < width * height:
                raise ValueError("GIF pixel data truncated")
            pal = np.frombuffer(ct.ljust(768, b"\x00"), dtype=np.uint8).reshape(256, 3)
            idx = np.frombuffer(bytes(indices[: width * height]), dtype=np.uint8)
            grid = idx.reshape(height, width)
            if ipacked & 0x40:
                # GIF89a interlace: rows stored in four passes
                # (0::8, 4::8, 2::4, 1::2) — scatter back
                out = np.zeros_like(grid)
                row = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    n_rows = len(range(start, height, step))
                    out[start::step] = grid[row : row + n_rows]
                    row += n_rows
                grid = out
            rgb = pal[grid]
            frames.append((width, height, np.ascontiguousarray(rgb)))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    return frames


def decode_image(data: bytes) -> Tuple[int, int, np.ndarray]:
    """Bytes → (width, height, HxWx3 uint8 RGB). Raises ValueError on
    unsupported/corrupt input (callers route it to the error channel)."""
    if not data:
        raise ValueError("empty media payload")
    if data[:8] == PNG_MAGIC:
        return _decode_png(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(data)
    if data[:2] == b"\xff\xd8":
        from dedoc_spark.core.jpeg_decode import decode_jpeg

        return decode_jpeg(data)
    if data[:4] in (b"II*\x00", b"MM\x00*", b"II+\x00", b"MM\x00+"):
        from dedoc_spark.core.tiff_decode import decode_tiff

        return decode_tiff(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from dedoc_spark.core.webp_decode import decode_webp

        return decode_webp(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        from dedoc_spark.core.heif_decode import decode_heif, is_heif

        if is_heif(data):
            return decode_heif(data)
    raise ValueError(f"unsupported image format (magic {data[:4]!r})")


def image_features(data: bytes) -> Tuple[int, int, list]:
    """(width, height, 8-dim feature) from REAL pixels: per-channel means
    and standard deviations plus luminance mean/std, all scaled to [0, 1].
    Deterministic — same bytes, same feature."""
    width, height, rgb = decode_image(data)
    f = rgb.astype(np.float64) / 255.0
    lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    feature = [
        float(f[:, :, 0].mean()),
        float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()),
        float(f[:, :, 0].std()),
        float(f[:, :, 1].std()),
        float(f[:, :, 2].std()),
        float(lum.mean()),
        float(lum.std()),
    ]
    return width, height, [round(v, 6) for v in feature]


def pixel_hash(data: bytes) -> str:
    """md5 of "{w}x{h}" + the hex-encoded decoded RGB buffer — a decode
    correctness fingerprint. Hex (not raw bytes) so a SQL oracle can
    reproduce it: DuckDB's md5() only takes VARCHAR."""
    import hashlib

    width, height, rgb = decode_image(data)
    return hashlib.md5(
        (f"{width}x{height}" + rgb.tobytes().hex()).encode()
    ).hexdigest()


def encode_gif(indices: np.ndarray, palette: bytes) -> bytes:
    """Minimal GIF89a writer for fixtures: one frame, global color table,
    real LZW compression (exercises the decoder's variable code widths)."""
    return encode_gif_frames([indices], palette)


def _lzw_image_block(indices: np.ndarray, min_code_size: int) -> bytes:
    height, width = indices.shape
    clear = 1 << min_code_size
    eoi = clear + 1

    # LZW encode
    codes = []
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    codes.append((clear, code_size))
    buf = b""
    for v in indices.astype(np.uint8).tobytes():
        cur = buf + bytes([v])
        if cur in table:
            buf = cur
            continue
        codes.append((table[buf], code_size))
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        buf = bytes([v])
    if buf:
        codes.append((table[buf], code_size))
    codes.append((eoi, code_size))

    acc = bits = 0
    out = bytearray()
    for code, size in codes:
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)

    img = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    return img + bytes([min_code_size]) + bytes(blocks)


def encode_gif_frames(frames: List[np.ndarray], palette: bytes) -> bytes:
    """Multi-frame GIF89a writer (fixtures for the frame-sampling
    operator): every frame is an index grid against one global color
    table, each written as its own image-descriptor block."""
    n_colors = len(palette) // 3
    ct_bits = max(1, (n_colors - 1).bit_length())
    gct = palette.ljust((2 ** ct_bits) * 3, b"\x00")
    min_code_size = max(2, ct_bits)
    height, width = frames[0].shape
    header = b"GIF89a" + struct.pack("<HH", width, height)
    header += bytes([0x80 | (ct_bits - 1), 0, 0]) + gct
    body = b"".join(_lzw_image_block(f, min_code_size) for f in frames)
    return header + body + b"\x3b"


def resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize: source index of output
    pixel i is floor(i * in / out) — integer math only, so a SQL oracle
    can rebuild the resized buffer arithmetically."""
    in_h, in_w = rgb.shape[0], rgb.shape[1]
    rows = (np.arange(out_h) * in_h) // out_h
    cols = (np.arange(out_w) * in_w) // out_w
    return np.ascontiguousarray(rgb[rows][:, cols])


# --- audio (WAV PCM, stdlib) ---------------------------------------------------


def decode_audio(data: bytes) -> Tuple[int, int, np.ndarray]:
    """WAV (RIFF PCM, 8/16/32-bit int) → (sample_rate, n_channels,
    mono float64 array in [-1, 1]). Other audio containers raise
    ValueError into the error channel — compressed codecs need external
    libraries by nature."""
    import io
    import wave

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"unsupported audio format (magic {data[:4]!r})")
    with wave.open(io.BytesIO(data)) as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        arr = arr.reshape(-1, channels).mean(axis=1)
    return rate, channels, arr


def audio_features(data: bytes) -> Tuple[int, int, list]:
    """(sample_rate, n_samples, 8-dim feature) from REAL samples: duration,
    RMS, peak, zero-crossing rate, and 4 coarse band energies via a plain
    rFFT — deterministic."""
    rate, _channels, mono = decode_audio(data)
    n = len(mono)
    if n == 0:
        raise ValueError("empty audio stream")
    duration = n / rate
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono)) ** 2
    total = float(spec.sum()) or 1.0
    quarters = [float(c.sum()) / total for c in np.array_split(spec, 4)]
    feature = [duration, rms, peak, zcr] + quarters
    return rate, n, [round(float(v), 6) for v in feature]


def encode_wav(samples: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """Fixture writer: 16-bit PCM WAV from float samples in [-1, 1]."""
    import io
    import wave

    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# --- fixture encoder (tests / driver oracles) ---------------------------------


def encode_png(rgb: np.ndarray, color_type: int = 2, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for fixtures: 8-bit, color types 2 (RGB) and 0
    (gray, pass HxW or HxWx1), one IDAT, selectable uniform filter type
    (0/1/2 — lets tests exercise the unfilter paths)."""
    if rgb.ndim == 2:
        rgb = rgb[:, :, None]
    height, width, channels = rgb.shape
    assert (color_type, channels) in ((2, 3), (0, 1))
    bpp = channels
    raw = bytearray()
    prev = bytes(width * bpp)
    for r in range(height):
        line = rgb[r].astype(np.uint8).tobytes()
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        elif filter_type == 1:  # Sub
            enc = bytearray(line)
            for i in range(len(enc) - 1, bpp - 1, -1):
                enc[i] = (enc[i] - line[i - bpp]) & 0xFF
            raw += enc
        elif filter_type == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
