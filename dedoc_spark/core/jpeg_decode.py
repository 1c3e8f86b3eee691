"""Baseline JPEG decoder (and a minimal encoder for round-trip tests) —
pure Python + numpy, public JPEG/JFIF spec (ITU-T T.81).

Scope: baseline/extended sequential (SOF0/SOF1) AND progressive (SOF2)
Huffman DCT — spectral selection + successive approximation with EOB-run
bookkeeping (T.81 G.2; control flow mirrors libjpeg's jdphuff) — 1- or
3-component scans, 4:4:4 / 4:2:2 / 4:2:0 subsampling (nearest-neighbor
chroma upsampling — a documented approximation of libjpeg's fancy
upsampler; fine for feature extraction), restart markers. Arithmetic
coding, hierarchical and 12-bit precision raise ValueError into the
pipeline's error channel. Architecture: every scan decodes into
per-component coefficient stores; dequant + a vectorized einsum IDCT run
once at the end.

The reference hands JPEG to PIL/cv2 (png_converter.py:16-39); neither is
in this container, so correctness is established by (a) an independent
minimal encoder here (block DCT + standard tables) whose output must
round-trip within quantization error, (b) hand-crafted DC-only streams
with closed-form pixel values, (c) the reference's own scanned-page
JPEGs decoding to their SOF dimensions with plausible pixel stats, and
(d) CROSS-FORMAT ground truth: the corpus's example page exists as both
lossless PNG and JPEG — the decodes agree to mean |diff| ≈ 1.2/255,
correlation 0.998 (test_cross_format_ground_truth).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# DCT-II basis matrix: M[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_M = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: Optional[int] = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        self.acc = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # the FF Dx bytes
            self.marker = None


def _extend(v: int, n: int) -> int:
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


class _Huff:
    """Canonical Huffman table → (maxlen-deep peek) decode via dicts of
    (length → {code: symbol}) plus a fast 16-bit peek path."""

    def __init__(self, counts: List[int], symbols: bytes) -> None:
        self.lookup: Dict[int, Tuple[int, int]] = {}
        code = 0
        k = 0
        self.by_len: List[Dict[int, int]] = [dict() for _ in range(17)]
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.by_len[length][code] = symbols[k]
                k += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        window = br.peek16()
        for length in range(1, 17):
            code = window >> (16 - length)
            tab = self.by_len[length]
            if code in tab:
                br.skip(length)
                return tab[code]
        raise ValueError("jpeg: invalid Huffman code")


def decode_jpeg(data: bytes) -> Tuple[int, int, np.ndarray]:
    """JPEG bytes → (width, height, HxWx3 uint8 RGB). Baseline, extended
    sequential AND progressive: every scan decodes into a per-component
    coefficient store (zigzag order); dequant + IDCT run once at the end —
    the architecture libjpeg uses for multi-scan files."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _Huff] = {}
    huff_ac: Dict[int, _Huff] = {}
    frame = None
    stores: Dict[int, np.ndarray] = {}
    restart_interval = 0
    adobe_transform = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01, 0xFF) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(data):
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec = body[b] >> 4
                tid = body[b] & 0x0F
                b += 1
                if prec:
                    table = np.frombuffer(body[b : b + 128], dtype=">u2").astype(np.int32)
                    b += 128
                else:
                    table = np.frombuffer(body[b : b + 64], dtype=np.uint8).astype(np.int32)
                    b += 64
                qt[tid] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            precision = body[0]
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": width, "h": height, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only Huffman sequential/progressive supported")
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc = body[b] >> 4
                th = body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                symbols = body[b + 17 : b + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, symbols)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            # APP14 transform flag: 0 = CMYK as stored, 2 = YCCK
            adobe_transform = body[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if not stores:
                stores = _init_stores(frame)
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 0x0F})
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            br = _BitReader(data, pos + 2 + seglen)
            _decode_scan_into(
                stores, br, frame, scan, huff_dc, huff_ac,
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
            )
            pos = max(br.pos, pos + 2 + seglen)
            continue
        pos += 2 + seglen
    if frame is None or not stores:
        raise ValueError("jpeg: no scan data")
    return _render(frame, stores, qt, adobe_transform)


def _mcu_geometry(frame):
    max_h = max(c["h"] for c in frame["comps"])
    max_v = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * max_h))
    mcus_y = -(-frame["h"] // (8 * max_v))
    return max_h, max_v, mcus_x, mcus_y


def _init_stores(frame) -> Dict[int, np.ndarray]:
    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
    return {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _decode_scan_into(stores, br, frame, scan, huff_dc, huff_ac, ri, ss, se, ah, al):
    """One scan → coefficient stores. Handles interleaved MCUs and
    non-interleaved single-component scans, sequential full-band blocks,
    and the four progressive block kinds (DC/AC × first/refine) with
    EOB-run bookkeeping (T.81 G.2; control flow mirrors libjpeg jdphuff)."""
    max_h, max_v, mcus_x, mcus_y = _mcu_geometry(frame)
    pred = {c["id"]: 0 for c in scan}
    state = {"eobrun": 0}

    def decode_block(c, coef):
        if ss == 0:
            if ah == 0:  # DC first (or start of a sequential block)
                t = huff_dc[c["dc"]].decode(br)
                diff = _extend(br.receive(t), t)
                pred[c["id"]] += diff
                coef[0] = pred[c["id"]] << al
            else:  # DC refinement: one bit
                if br.receive(1):
                    coef[0] |= 1 << al
            if se == 0:
                return
        # AC band (sequential continues here with ss=0 → band starts at 1)
        k = max(ss, 1)
        ach = huff_ac[c["ac"]]
        if ah == 0:  # AC first / sequential
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            while k <= se:
                rs = ach.decode(br)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    k += r
                    if k > se:
                        raise ValueError("jpeg: AC index overflow")
                    coef[k] = _extend(br.receive(s), s) << al
                    k += 1
                else:
                    if r != 15:
                        eob = 1 << r
                        if r:
                            eob += br.receive(r)
                        state["eobrun"] = eob - 1  # current block included
                        break
                    k += 16
        else:  # AC refinement (jdphuff decode_mcu_AC_refine)
            p1 = 1 << al
            m1 = -p1
            if state["eobrun"] == 0:
                while k <= se:
                    rs = ach.decode(br)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s:
                        newval = p1 if br.receive(1) else m1
                    elif r != 15:
                        eob = 1 << r
                        if r:
                            eob += br.receive(r)
                        state["eobrun"] = eob
                        break
                    while k <= se:
                        t = int(coef[k])
                        if t != 0:
                            if br.receive(1) and (t & p1) == 0:
                                coef[k] = t + (p1 if t >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if s and k <= se:
                        coef[k] = newval
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    t = int(coef[k])
                    if t != 0:
                        if br.receive(1) and (t & p1) == 0:
                            coef[k] = t + (p1 if t >= 0 else m1)
                    k += 1
                state["eobrun"] -= 1

    def maybe_restart(unit_idx):
        if ri and unit_idx and unit_idx % ri == 0:
            br.sync_restart()
            for key in pred:
                pred[key] = 0
            state["eobrun"] = 0

    if len(scan) == 1:
        c = scan[0]
        cw = -(-frame["w"] * c["h"] // max_h)
        ch = -(-frame["h"] * c["v"] // max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        store = stores[c["id"]]
        for i in range(bw * bh):
            maybe_restart(i)
            decode_block(c, store[i // bw, i % bw])
    else:
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart(unit)
                for c in scan:
                    store = stores[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(c, store[my * c["v"] + by, mx * c["h"] + bx])
                unit += 1


def _render(frame, stores, qt, adobe_transform=None):
    """Dequant + IDCT + upsample + color convert, once, after all scans."""
    width, height = frame["w"], frame["h"]
    max_h, max_v, _, _ = _mcu_geometry(frame)
    full = []
    for c in frame["comps"]:
        store = stores[c["id"]].astype(np.float64)
        q = qt[c["tq"]].astype(np.float64)
        by, bx, _ = store.shape
        deq = store * q  # zigzag order
        nat = np.zeros_like(deq)
        nat[:, :, _ZIGZAG] = deq
        blocks = nat.reshape(by, bx, 8, 8)
        # vectorized IDCT over all blocks: M.T @ F @ M
        spatial = np.einsum("ux,yvuw,wz->yvxz", _M, blocks, _M) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if c["h"] != max_h or c["v"] != max_v:
            plane = np.repeat(np.repeat(plane, max_v // c["v"], axis=0),
                              max_h // c["h"], axis=1)
        full.append(plane[:height, :width])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return width, height, np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(full) == 4:
        # With an Adobe APP14 marker: CMYK (transform 0) / YCCK (transform
        # 2), values stored INVERTED (255 = no ink) so RGB = ch * K / 255.
        # WITHOUT the marker (adobe_transform None): standard non-inverted
        # CMYK — libjpeg/PIL do NOT invert, so RGB = (255-ch)(255-K)/255
        # (r6 review finding: print-workflow encoders hit this path).
        if adobe_transform == 2:
            y, cb, cr, k = full
            c = np.clip(y + 1.402 * (cr - 128.0), 0, 255)
            m = np.clip(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0), 0, 255)
            ye = np.clip(y + 1.772 * (cb - 128.0), 0, 255)
        else:
            c, m, ye, k = (np.clip(p, 0, 255) for p in full)
        k = np.clip(k, 0, 255)
        if adobe_transform is None:
            c, m, ye, k = 255.0 - c, 255.0 - m, 255.0 - ye, 255.0 - k
        rgb = np.stack([c * k, m * k, ye * k], axis=2) / 255.0
        return width, height, np.ascontiguousarray(np.clip(rgb, 0, 255).astype(np.uint8))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return width, height, np.ascontiguousarray(np.clip(rgb, 0, 255).astype(np.uint8))


# --- minimal encoder (round-trip tests only) -----------------------------------

# K.1/K.2 example quantization tables from the JPEG spec (quality ~50)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])

# spec K.3/K.5 standard luminance Huffman tables
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_SYMBOLS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0xFF, 8 - self.nbits % 8 if self.nbits % 8 else 0)
        return bytes(self.out)


def _huff_codes(counts: List[int], symbols: bytes) -> Dict[int, Tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """Minimal single-component baseline JPEG (luma quant + standard
    Huffman tables, no subsampling) — for decoder round-trip tests."""
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.zeros((ph, pw), dtype=np.float64)
    padded[:h, :w] = img.astype(np.float64)
    padded[h:, :w] = img[-1:, :].astype(np.float64)
    padded[:, w:] = padded[:, w - 1 : w]

    dc_codes = _huff_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _huff_codes(_AC_COUNTS, _AC_SYMBOLS)
    bw = _BitWriter()
    pred = 0
    qzig = _Q_LUMA.astype(np.float64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coefs = _M @ block @ _M.T
            zig = np.round(coefs.reshape(64)[_ZIGZAG] / qzig).astype(np.int64)
            diff = int(zig[0]) - pred
            pred = int(zig[0])
            s = int(abs(diff)).bit_length()
            code, length = dc_codes[s]
            bw.write(code, length)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max(np.nonzero(zig)[0]) if np.any(zig[1:]) else 0
            for k in range(1, 64):
                v = int(zig[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                s = int(abs(v)).bit_length()
                code, length = ac_codes[(run << 4) | s]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]
                bw.write(code, length)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in _Q_LUMA))
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return out
