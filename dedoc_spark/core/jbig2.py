"""Embedded JBIG2 (ITU-T T.88) decoder for PDF ``/JBIG2Decode`` image
streams — the last scan codec real-world PDFs commonly ship that this
engine previously skipped.

Scope: the PDF *embedded stream* organisation (no file header) with

  * GENERIC REGION segments, both coding modes: MMR=1 (T.6/Group 4,
    reuses core/ccitt.decode_g4) and MMR=0 (MQ arithmetic coding per
    T.88 Annex E software conventions, GB templates 0-3, nominal or
    custom AT pixels, TPGDON typical-prediction rows);
  * arithmetic SYMBOL DICTIONARIES (T.88 6.5) + TEXT REGIONS (6.4) —
    the mode jbig2enc and scanner firmware emit for text-heavy pages:
    integer arithmetic decoding (Annex A IADH/IADW/IAEX/IADT/IAFS/
    IADS/IAIT + IAID), height classes, export runs, strip placement
    with all four reference corners on the non-transposed path, and
    cross-segment symbol inheritance via referred-to segments (incl.
    dictionaries living in the /JBIG2Globals stream).

Huffman-coded dictionaries/regions, refinement/aggregate coding,
transposed text regions and halftones raise :class:`Jbig2Error`, and
the caller (ocr._decode_image_object) skips the image exactly as it
does for any codec it lacks.

The reference hands scanned PDFs to pdf2image/poppler, which decodes
JBIG2 natively (pdf_image_reader/pdf_image_reader.py:60-97 receives
page rasters); this pure-python port keeps that capability without the
native stack. The MQ coder here is validated by an in-repo encoder
(fixture path) round-trip — the coder pair implements T.88 E.2/E.3
exactly, including byte stuffing around 0xFF.

Performance: the arithmetic path is a sequential per-pixel loop (an
adaptive arithmetic coder cannot be vectorized); the nominal-AT
template-0 fast path runs ~1-2 Mpx/s, so a 300-dpi A4 page decodes in
seconds. ``max_pixels`` bounds worst-case CPU per image — beyond it the
image is skipped (typed Jbig2Error), never a stalled executor.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


class Jbig2Error(ValueError):
    """Unsupported segment type / malformed stream — callers skip."""


# --- MQ arithmetic coder (T.88 Annex E, Table E.1) ---------------------------

_QE = [
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601,
]
_NMPS = [
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46,
]
_NLPS = [
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46,
]
_SWITCH = [
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


class MQDecoder:
    """T.88 E.3 software-conventions decoder. Context state lives in the
    caller's (index, mps) arrays so one decoder serves 2^16 contexts."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.bp = 0
        b0 = data[0] if self.n else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < self.n else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, icx: bytearray, mps: bytearray, cx: int) -> int:
        i = icx[cx]
        qe = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps[cx]
                icx[cx] = _NMPS[i]
            else:
                d = 1 - mps[cx]
                if _SWITCH[i]:
                    mps[cx] ^= 1
                icx[cx] = _NLPS[i]
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps[cx]
            if self.a < qe:
                d = 1 - mps[cx]
                if _SWITCH[i]:
                    mps[cx] ^= 1
                icx[cx] = _NLPS[i]
            else:
                d = mps[cx]
                icx[cx] = _NMPS[i]
        # RENORMD
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                self.c = c
                self._bytein()
                c, ct = self.c, self.ct
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct
        return d


class MQEncoder:
    """T.88 E.2 encoder — the fixture side of the round-trip."""

    __slots__ = ("out", "c", "a", "ct")

    def __init__(self) -> None:
        self.out = bytearray([0])  # slot for the pre-buffer byte B
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def _byteout(self) -> None:
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            out[-1] += 1  # propagate carry into B
            if out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, icx: bytearray, mps: bytearray, cx: int, d: int) -> None:
        i = icx[cx]
        qe = _QE[i]
        if d == mps[cx]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = _NMPS[i]
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                mps[cx] ^= 1
            icx[cx] = _NLPS[i]
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFF
        self._byteout()
        return bytes(self.out[1:])  # drop the pre-buffer slot


# --- generic region decoding (T.88 6.2.5.7) ----------------------------------

# fixed template pixel positions (dy, dx), BEFORE merging with AT pixels
_TEMPLATES = {
    0: [(-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -4), (0, -3), (0, -2), (0, -1)],
    1: [(-2, -1), (-2, 0), (-2, 1), (-2, 2),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -3), (0, -2), (0, -1)],
    2: [(-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1),
        (0, -2), (0, -1)],
    3: [(-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1),
        (0, -4), (0, -3), (0, -2), (0, -1)],
}
_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# TPGDON pseudo-pixel context per template (T.88 6.2.5.7)
_TPGD_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _sorted_template(template: int, at: List[Tuple[int, int]]):
    """Merged fixed+AT positions sorted (y, x) — first entry is the
    context MSB (same canonical ordering pdf.js/jbig2dec use)."""
    pos = [(dy, dx) for dy, dx in _TEMPLATES[template]]
    pos += [(dy, dx) for dx, dy in at]  # AT pairs arrive as (x, y)
    pos.sort()
    return pos


def decode_generic(
    data: bytes,
    width: int,
    height: int,
    template: int = 0,
    at: Optional[List[Tuple[int, int]]] = None,
    tpgdon: bool = False,
    decoder: Optional[MQDecoder] = None,
    icx: Optional[bytearray] = None,
    mps: Optional[bytearray] = None,
) -> np.ndarray:
    """MQ-coded generic region -> HxW uint8 bitmap (1 = black).
    Out-of-bounds context pixels read 0, per the spec."""
    if template not in _TEMPLATES:
        raise Jbig2Error(f"jbig2: bad template {template}")
    at = list(at) if at else list(_NOMINAL_AT[template])
    dec = decoder or MQDecoder(data)
    n_ctx = 1 << 16
    icx = icx if icx is not None else bytearray(n_ctx)
    mps = mps if mps is not None else bytearray(n_ctx)
    # decoded rows collect as bytes and assemble into the bitmap ONCE at
    # the end — a per-row frombuffer/assign pair was ~1/3 of the cost of
    # decoding the tiny symbol-dictionary bitmaps
    out_rows: List[bytes] = []
    rows: List[bytearray] = [bytearray(width + 8) for _ in range(2)]
    pad = 4  # row buffers are padded by 4 on each side
    ltp = 0
    tp_ctx = _TPGD_CTX[template]

    fast = template == 0 and at == _NOMINAL_AT[0]
    pos = None if fast else _sorted_template(template, at)

    for y in range(height):
        if tpgdon:
            if dec.decode(icx, mps, tp_ctx):
                ltp ^= 1
            if ltp:  # typical row: copy the previous one
                if y:
                    out_rows.append(out_rows[-1])
                    rows.append(rows[-1][:])
                    rows.pop(0)
                else:
                    out_rows.append(bytes(width))
                    rows.append(bytearray(width + 8))
                    rows.pop(0)
                continue
        cur = bytearray(width + 8)
        m1, m2 = rows[-1], rows[-2]
        if fast:
            # sliding 5/7/4-bit windows over rows y-2 / y-1 / y,
            # seeded for x = 0 (out-of-range reads are the pad zeros);
            # the T.88 E.3 DECODE/RENORMD/BYTEIN bodies are inlined in
            # the pixel loop (the per-pixel method call plus attribute
            # traffic dominated the arithmetic — measured ~2.5x)
            r2 = 0
            r1 = 0
            for k in range(-2, 1):
                r2 = (r2 << 1) | m2[pad + k]
            r2 = (r2 << 2) | (m2[pad + 1] << 1) | m2[pad + 2]
            for k in range(-3, 4):
                r1 = (r1 << 1) | m1[pad + k]
            r0 = 0
            a, c, ct, bp = dec.a, dec.c, dec.ct, dec.bp
            data, nd = dec.data, dec.n
            qe_t, nmps_t, nlps_t, sw_t = _QE, _NMPS, _NLPS, _SWITCH
            x = 0
            while x < width:
                if r0 == 0 and r1 == 0 and r2 == 0 and mps[0] == 0:
                    # blank stretch: while the context stays 0 (no ink in
                    # either upper-row window and none decoded), k MPS
                    # decodes with no renormalization are exactly
                    # a -= k*qe, c_high -= k*qe — skip them in O(1).
                    # The stretch ends at the next ink byte in the upper
                    # rows (bytearray.find = memchr) or at the next
                    # renormalization boundary, whichever is first.
                    q1 = m1.find(1, pad + x + 4)
                    if q1 < 0:
                        q1 = width + pad + 8
                    q2 = m2.find(1, pad + x + 3)
                    if q2 < 0:
                        q2 = width + pad + 8
                    lend = q1 - pad - 3
                    t = q2 - pad - 2
                    if t < lend:
                        lend = t
                    if lend > width:
                        lend = width
                    if lend > x:
                        qe = qe_t[icx[0]]
                        k = (a - 0x8000) // qe
                        t = ((c >> 16) & 0xFFFF) // qe
                        if t < k:
                            k = t
                        if k > lend - x:
                            k = lend - x
                        if k > 0:
                            kq = k * qe
                            a -= kq
                            c -= kq << 16
                            x += k
                            if x < width:
                                # rebuild the windows for the next pixel:
                                # a batch that ran up to the ink boundary
                                # leaves the slid-in neighbor bits nonzero
                                p = pad + x
                                r2 = (
                                    (m2[p - 2] << 4) | (m2[p - 1] << 3)
                                    | (m2[p] << 2) | (m2[p + 1] << 1) | m2[p + 2]
                                )
                                r1 = (
                                    (m1[p - 3] << 6) | (m1[p - 2] << 5)
                                    | (m1[p - 1] << 4) | (m1[p] << 3)
                                    | (m1[p + 1] << 2) | (m1[p + 2] << 1)
                                    | m1[p + 3]
                                )
                            continue
                cx = (r2 << 11) | (r1 << 4) | r0
                i = icx[cx]
                qe = qe_t[i]
                a -= qe
                if ((c >> 16) & 0xFFFF) < qe:
                    # LPS exchange path
                    if a < qe:
                        b = mps[cx]
                        icx[cx] = nmps_t[i]
                    else:
                        b = 1 - mps[cx]
                        if sw_t[i]:
                            mps[cx] ^= 1
                        icx[cx] = nlps_t[i]
                    a = qe
                else:
                    c -= qe << 16
                    if a & 0x8000:
                        b = mps[cx]
                        cur[pad + x] = b
                        r2 = ((r2 << 1) | m2[pad + x + 3]) & 0x1F
                        r1 = ((r1 << 1) | m1[pad + x + 4]) & 0x7F
                        r0 = ((r0 << 1) | b) & 0x0F
                        x += 1
                        continue
                    if a < qe:
                        b = 1 - mps[cx]
                        if sw_t[i]:
                            mps[cx] ^= 1
                        icx[cx] = nlps_t[i]
                    else:
                        b = mps[cx]
                        icx[cx] = nmps_t[i]
                while True:  # RENORMD
                    if ct == 0:  # BYTEIN
                        b0 = data[bp] if bp < nd else 0xFF
                        if b0 == 0xFF:
                            b1 = data[bp + 1] if bp + 1 < nd else 0xFF
                            if b1 > 0x8F:
                                c += 0xFF00
                                ct = 8
                            else:
                                bp += 1
                                c += b1 << 9
                                ct = 7
                        else:
                            bp += 1
                            c += (data[bp] if bp < nd else 0xFF) << 8
                            ct = 8
                    a = (a << 1) & 0xFFFF
                    c = (c << 1) & 0xFFFFFFFF
                    ct -= 1
                    if a & 0x8000:
                        break
                cur[pad + x] = b
                r2 = ((r2 << 1) | m2[pad + x + 3]) & 0x1F
                r1 = ((r1 << 1) | m1[pad + x + 4]) & 0x7F
                r0 = ((r0 << 1) | b) & 0x0F
                x += 1
            dec.a, dec.c, dec.ct, dec.bp = a, c, ct, bp
        else:
            d = dec.decode
            grid = {-2: m2, -1: m1, 0: cur}
            for x in range(width):
                ctx = 0
                for dy, dx in pos:
                    ctx = (ctx << 1) | grid[dy][pad + x + dx]
                b = d(icx, mps, ctx)
                cur[pad + x] = b
        out_rows.append(bytes(cur[pad : pad + width]))
        rows.append(cur)
        rows.pop(0)
    buf = bytearray(b"".join(out_rows))
    if len(buf) < height * width:  # stream ended early: zero-fill like np.zeros did
        buf.extend(bytes(height * width - len(buf)))
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width)


def encode_generic(
    bitmap: np.ndarray,
    template: int = 0,
    at: Optional[List[Tuple[int, int]]] = None,
    encoder: Optional[MQEncoder] = None,
    icx: Optional[bytearray] = None,
    mps: Optional[bytearray] = None,
) -> Optional[bytes]:
    """Fixture-side generic-region MQ encoder (no TPGDON), the exact
    mirror of decode_generic — round-trip tested. With an external
    ``encoder`` the bits join its stream (symbol-dictionary use) and
    None is returned; standalone, the flushed bytes come back.

    Unlike the decoder, the encoder knows every pixel up front, so the
    per-pixel context values are computed for the WHOLE region with a
    handful of shifted-array adds (every JBIG2 template is causal:
    dy < 0, or dy == 0 and dx < 0), and the remaining Python loop runs
    only the sequential MQ state machine, inlined — the per-pixel
    method call plus sliding-window bookkeeping was ~4x the cost of the
    arithmetic itself. Emitted bytes are identical: same context
    sequence, same T.88 E.2 operations."""
    if template not in _TEMPLATES:
        raise Jbig2Error(f"jbig2: bad template {template}")
    at = list(at) if at else list(_NOMINAL_AT[template])
    h, w = bitmap.shape
    standalone = encoder is None
    enc = encoder or MQEncoder()
    n_ctx = 1 << 16
    icx = icx if icx is not None else bytearray(n_ctx)
    mps = mps if mps is not None else bytearray(n_ctx)
    pos = _sorted_template(template, at)
    for dy, dx in pos:
        if dy > 0 or (dy == 0 and dx >= 0):
            raise Jbig2Error(f"jbig2: non-causal template pixel {(dy, dx)}")

    a = enc.a
    c = enc.c
    ct = enc.ct
    out = enc.out
    qe_t, nmps_t, nlps_t, sw_t = _QE, _NMPS, _NLPS, _SWITCH

    def _symbol(cx: int, d: int) -> None:
        nonlocal a, c, ct
        i = icx[cx]
        qe = qe_t[i]
        if d == mps[cx]:  # CODEMPS
            a -= qe
            if a & 0x8000:
                c += qe
                return
            if a < qe:
                a = qe
            else:
                c += qe
            icx[cx] = nmps_t[i]
        else:  # CODELPS
            a -= qe
            if a < qe:
                c += qe
            else:
                a = qe
            if sw_t[i]:
                mps[cx] ^= 1
            icx[cx] = nlps_t[i]
        while True:  # RENORME
            if ct == 0:  # BYTEOUT
                if out[-1] == 0xFF:
                    out.append((c >> 20) & 0xFF)
                    c &= 0xFFFFF
                    ct = 7
                elif c < 0x8000000:
                    out.append((c >> 19) & 0xFF)
                    c &= 0x7FFFF
                    ct = 8
                else:
                    out[-1] += 1
                    if out[-1] == 0xFF:
                        c &= 0x7FFFFFF
                        out.append((c >> 20) & 0xFF)
                        c &= 0xFFFFF
                        ct = 7
                    else:
                        out.append((c >> 19) & 0xFF)
                        c &= 0x7FFFF
                        ct = 8
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFF
            ct -= 1
            if a & 0x8000:
                break

    if h * w <= 4096 and template == 0 and at == _NOMINAL_AT[0]:
        # tiny bitmaps (symbol-dictionary glyphs): the numpy context
        # build costs more than the loop it saves — python sliding
        # windows over the nominal template are cheaper
        pad = 4
        rows: List[bytearray] = [bytearray(w + 8) for _ in range(2)]
        flat = (np.asarray(bitmap) & 1).ravel().tolist()
        fx = 0
        for y in range(h):
            cur = bytearray(w + 8)
            m1, m2 = rows[-1], rows[-2]
            r2 = (m2[pad - 2] << 4) | (m2[pad - 1] << 3) | (m2[pad] << 2) \
                | (m2[pad + 1] << 1) | m2[pad + 2]
            r1 = 0
            for k in range(-3, 4):
                r1 = (r1 << 1) | m1[pad + k]
            r0 = 0
            for x in range(w):
                b = flat[fx]
                fx += 1
                cx = (r2 << 11) | (r1 << 4) | r0
                if b == mps[cx]:  # inline the no-renorm CODEMPS hot path
                    na = a - qe_t[icx[cx]]
                    if na & 0x8000:
                        a = na
                        c += qe_t[icx[cx]]
                    else:
                        _symbol(cx, b)
                else:
                    _symbol(cx, b)
                cur[pad + x] = b
                r2 = ((r2 << 1) | m2[pad + x + 3]) & 0x1F
                r1 = ((r1 << 1) | m1[pad + x + 4]) & 0x7F
                r0 = ((r0 << 1) | b) & 0x0F
            rows.append(cur)
            rows.pop(0)
        enc.a, enc.c, enc.ct = a, c, ct
        return enc.flush() if standalone else None

    bits = (np.asarray(bitmap) != 0).astype(np.uint32)
    pad_top = max(-dy for dy, _ in pos)
    pad_l = max(0, max(-dx for _, dx in pos))
    pad_r = max(0, max(dx for _, dx in pos))
    pb = np.pad(bits, ((pad_top, 0), (pad_l, pad_r)))
    ctx = np.zeros((h, w), dtype=np.uint32)
    nbits = len(pos)
    for k, (dy, dx) in enumerate(pos):
        shift = np.uint32(nbits - 1 - k)
        ctx += pb[pad_top + dy : pad_top + dy + h, pad_l + dx : pad_l + dx + w] << shift

    # inlined T.88 E.2 over the precomputed (context, bit) stream. The
    # stream is mostly (ctx=0, bit=0) — blank paper — and a run of k MPS
    # symbols at one context with no renormalization is exactly
    # a -= k*qe, c += k*qe (no state-table traffic), so only the
    # "events" (ink or an inked context neighborhood) and the
    # renormalization boundaries run the full per-symbol body.
    flat_ctx = ctx.ravel()
    flat_bits = bits.ravel()
    n_px = flat_ctx.shape[0]
    events = np.nonzero((flat_ctx | flat_bits) != 0)[0].tolist()
    idx = 0
    for eidx in events + [n_px]:
        gap = eidx - idx
        while gap > 0:  # blank stretch: all (ctx=0, bit=0)
            if mps[0] == 0:
                qe = qe_t[icx[0]]
                k = (a - 0x8000) // qe
                if k > gap:
                    k = gap
                if k > 0:
                    a -= k * qe
                    c += k * qe
                    gap -= k
                    continue
            _symbol(0, 0)  # renormalization step (or flipped-MPS state)
            gap -= 1
        if eidx < n_px:
            _symbol(int(flat_ctx[eidx]), int(flat_bits[eidx]))
        idx = eidx + 1
    enc.a, enc.c, enc.ct = a, c, ct
    return enc.flush() if standalone else None


# --- integer arithmetic decoding (T.88 Annex A) -------------------------------

OOB = object()  # out-of-band sentinel

_INT_RANGES = [(2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436)]


class IntCtx:
    """One IAx procedure's 512-entry adaptive context."""

    __slots__ = ("icx", "mps")

    def __init__(self) -> None:
        self.icx = bytearray(512)
        self.mps = bytearray(512)


def decode_int(dec: MQDecoder, ctx: IntCtx):
    """A.2 — returns an int or OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(ctx.icx, ctx.mps, prev)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    for i, (n, offset) in enumerate(_INT_RANGES):
        if i == len(_INT_RANGES) - 1 or bit() == 0:
            v = 0
            for _ in range(n):
                v = (v << 1) | bit()
            v += offset
            if s and v == 0:
                return OOB
            return -v if s else v
    raise AssertionError("unreachable")


def encode_int(enc: MQEncoder, ctx: IntCtx, value) -> None:
    """Mirror of decode_int; ``value`` may be OOB."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(ctx.icx, ctx.mps, prev, b)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    if value is OOB:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
    bit(s)
    for i, (n, offset) in enumerate(_INT_RANGES):
        last = i == len(_INT_RANGES) - 1
        nxt_off = _INT_RANGES[i + 1][1] if not last else None
        if last or v < nxt_off:
            if not last:
                bit(0)
            rem = v - offset
            for k in range(n - 1, -1, -1):
                bit((rem >> k) & 1)
            return
        bit(1)


def decode_iaid(dec: MQDecoder, ctx_icx: bytearray, ctx_mps: bytearray, code_len: int) -> int:
    """A.3 symbol-ID decoding over a (1 << (code_len+1)) context tree."""
    prev = 1
    for _ in range(code_len):
        prev = (prev << 1) | dec.decode(ctx_icx, ctx_mps, prev)
    return prev - (1 << code_len)


def encode_iaid(enc: MQEncoder, ctx_icx: bytearray, ctx_mps: bytearray, code_len: int, value: int) -> None:
    prev = 1
    for k in range(code_len - 1, -1, -1):
        b = (value >> k) & 1
        enc.encode(ctx_icx, ctx_mps, prev, b)
        prev = (prev << 1) | b


# --- symbol dictionary + text region (T.88 6.4 / 6.5) -------------------------


def decode_symbol_dict(
    payload: bytes, input_syms: List[np.ndarray], max_pixels: int = 1 << 24
) -> List[np.ndarray]:
    """Arithmetic symbol dictionary -> exported symbol bitmaps (1=black).
    SDHUFF (huffman) and SDREFAGG (refinement/aggregate) raise — the
    dominant encoder output (jbig2enc default) uses neither.
    ``max_pixels`` bounds the CUMULATIVE symbol-bitmap area (each pixel
    costs a Python-level arithmetic decode, so this is the CPU valve)."""
    if len(payload) < 2:
        raise Jbig2Error("jbig2: truncated symbol dictionary")
    flags = struct.unpack_from(">H", payload, 0)[0]
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    if sdhuff:
        raise Jbig2Error("jbig2: huffman symbol dictionary unsupported")
    if sdrefagg:
        raise Jbig2Error("jbig2: refinement/aggregate coding unsupported")
    if (flags >> 8) & 1:
        # T.88 7.4.3.1.1 bit 8: GB context imported from a referred-to
        # dictionary — decoding with a fresh context would yield silently
        # wrong glyphs, so refuse like the other unsupported modes.
        raise Jbig2Error("jbig2: imported bitmap coding context unsupported")
    p = 2
    n_at = 4 if template == 0 else 1
    at: List[Tuple[int, int]] = []
    for _ in range(n_at):
        at.append(struct.unpack_from("bb", payload, p))
        p += 2
    num_ex = _u32(payload, p)
    num_new = _u32(payload, p + 4)
    p += 8
    if num_new > 10000 or num_ex > 10000:
        raise Jbig2Error("jbig2: implausible symbol counts")

    dec = MQDecoder(payload[p:])
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    gb_icx = bytearray(1 << 16)
    gb_mps = bytearray(1 << 16)
    new_syms: List[np.ndarray] = []
    hc_height = 0
    budget = max_pixels
    classes = 0
    while len(new_syms) < num_new:
        # a valid stream adds >=1 symbol per height class, so more
        # classes than symbols means the exhausted-decoder fixed point
        # is feeding us empty classes forever — bail out.
        classes += 1
        if classes > num_new:
            raise Jbig2Error("jbig2: empty height classes (no progress)")
        dh = decode_int(dec, iadh)
        if dh is OOB:
            raise Jbig2Error("jbig2: OOB height delta")
        hc_height += dh
        sym_width = 0
        while True:
            dw = decode_int(dec, iadw)
            if dw is OOB:
                break
            sym_width += dw
            if len(new_syms) >= num_new:
                raise Jbig2Error("jbig2: too many symbols in dictionary")
            if not (0 < sym_width <= 1 << 14 and 0 < hc_height <= 1 << 14):
                raise Jbig2Error("jbig2: bad symbol size")
            budget -= sym_width * hc_height
            if budget < 0:
                raise Jbig2Error("jbig2: symbol dictionary over the pixel budget")
            new_syms.append(
                decode_generic(
                    b"", sym_width, hc_height, template, at,
                    decoder=dec, icx=gb_icx, mps=gb_mps,
                )
            )
    # export flags: alternating skip/export run lengths over all symbols
    all_syms = input_syms + new_syms
    exported: List[np.ndarray] = []
    i = 0
    cur = 0
    runs = 0
    while i < len(all_syms):
        # alternating runs cover each symbol at most once, so a valid
        # stream needs at most len+1 nonzero runs plus interleaved
        # zeros; beyond 2*len+2 iterations run==0 is spinning in place.
        runs += 1
        if runs > 2 * len(all_syms) + 2:
            raise Jbig2Error("jbig2: export runs make no progress")
        run = decode_int(dec, iaex)
        if run is OOB or run < 0:
            raise Jbig2Error("jbig2: bad export run")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
    if len(exported) != num_ex:
        raise Jbig2Error("jbig2: export count mismatch")
    return exported


def decode_text_region(
    payload: bytes, symbols: List[np.ndarray], max_pixels: int
) -> Tuple[int, int, int, int, int, np.ndarray]:
    """Arithmetic text region -> (x, y, w, h, comb_op, bitmap)."""
    if len(payload) < 19:
        raise Jbig2Error("jbig2: truncated text region")
    w, h, x, y = (_u32(payload, k) for k in (0, 4, 8, 12))
    comb_op = payload[16] & 0x07
    flags = struct.unpack_from(">H", payload, 17)[0]
    sbhuff = flags & 1
    refine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    ref_corner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sb_comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32
    rtemplate = (flags >> 15) & 1
    if sbhuff:
        raise Jbig2Error("jbig2: huffman text region unsupported")
    if transposed:
        raise Jbig2Error("jbig2: transposed text region unsupported")
    p = 19
    if refine and rtemplate == 0:
        p += 4  # refinement AT pixels (only consulted when RI != 0)
    num_instances = _u32(payload, p)
    p += 4
    if not symbols:
        raise Jbig2Error("jbig2: text region with no symbols")
    if w == 0 or h == 0 or w * h > max_pixels:
        raise Jbig2Error("jbig2: text region over the pixel budget")
    if num_instances > w * h:
        # SBNUMINSTANCES is a raw u32; every instance occupies >=1 pixel
        # column, so more instances than pixels is a crafted/corrupt
        # stream spinning the placement loop (each iteration is several
        # Python-level arithmetic decodes fed free by 0xFF padding).
        raise Jbig2Error("jbig2: implausible instance count")
    strips = 1 << log_strips
    n = len(symbols)
    code_len = max(1, (n - 1).bit_length()) if n > 1 else 0
    dec = MQDecoder(payload[p:])
    iadt, iafs, iads, iait, iari = (IntCtx() for _ in range(5))
    id_icx = bytearray(1 << (code_len + 1))
    id_mps = bytearray(1 << (code_len + 1))

    region = np.full((h, w), def_pixel, dtype=np.uint8)
    op = _COMBINE.get(sb_comb_op, _COMBINE[0])
    dt0 = decode_int(dec, iadt)
    if dt0 is OOB:
        raise Jbig2Error("jbig2: OOB strip T")
    strip_t = -dt0 * strips
    first_s = 0
    n_inst = 0
    while n_inst < num_instances:
        dt = decode_int(dec, iadt)
        if dt is OOB:
            raise Jbig2Error("jbig2: OOB strip T")
        strip_t += dt * strips
        first = True
        cur_s = 0
        while True:
            if first:
                dfs = decode_int(dec, iafs)
                if dfs is OOB:
                    raise Jbig2Error("jbig2: OOB first S")
                first_s += dfs
                cur_s = first_s
                first = False
            else:
                ids = decode_int(dec, iads)
                if ids is OOB:
                    break
                cur_s += ids + ds_offset
            if n_inst >= num_instances:
                break
            cur_t = decode_int(dec, iait) if strips > 1 else 0
            if cur_t is OOB:
                raise Jbig2Error("jbig2: OOB in-strip T")
            t = strip_t + cur_t
            sym_id = decode_iaid(dec, id_icx, id_mps, code_len)
            if sym_id >= n:
                raise Jbig2Error("jbig2: symbol id out of range")
            if refine and decode_int(dec, iari):
                raise Jbig2Error("jbig2: refined symbol instance unsupported")
            bm = symbols[sym_id]
            hi, wi = bm.shape
            # non-transposed: CURS is the LEFT edge; REFCORNER picks
            # top- vs bottom-anchored T (pdf.js-compatible placement)
            y0 = t if ref_corner & 1 else t - hi + 1
            x0 = cur_s
            ys, xs = max(0, y0), max(0, x0)
            ye, xe = min(h, y0 + hi), min(w, x0 + wi)
            if ys < ye and xs < xe:
                sub = region[ys:ye, xs:xe]
                region[ys:ye, xs:xe] = op(
                    sub, bm[ys - y0 : ye - y0, xs - x0 : xe - x0]
                ).astype(np.uint8)
            cur_s += wi - 1
            n_inst += 1
    return x, y, w, h, comb_op, region


def encode_symbol_text(
    glyphs: List[np.ndarray],
    placements: List[Tuple[int, int, int]],
    page_w: int,
    page_h: int,
    parts: bool = False,
    log_strips: int = 0,
    ref_corner: int = 1,
):
    """Fixture-side mirror of decode_symbol_dict + decode_text_region:
    a full embedded stream of page-info + arithmetic symbol dictionary
    (template 0, nominal AT, no huffman/refinement) + one immediate
    text region (OR compositing) referencing it. ``placements`` are
    (glyph_index, x, y) with y the TOP row regardless of
    ``ref_corner`` — bottom-anchored corners (0/2) re-express y as the
    bottom row in the T coordinate. ``log_strips`` > 0 exercises the
    in-strip IAIT procedure (SBSTRIPS = 1 << log_strips). Round-trip
    tested against decode_embedded.

    With ``parts=True`` returns ``(globals_bytes, page_bytes)`` — the
    dictionary alone in the first (the /JBIG2Globals organisation PDF
    writers use for shared dictionaries), page-info + text region in
    the second."""
    if not glyphs or not placements:
        raise ValueError("need at least one glyph and one placement")
    template = 0
    at = _NOMINAL_AT[0]

    # -- symbol dictionary: height classes ascending, widths in input order
    order = sorted(range(len(glyphs)), key=lambda i: (glyphs[i].shape[0], i))
    id_of = {orig: new for new, orig in enumerate(order)}
    enc = MQEncoder()
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    gb_icx = bytearray(1 << 16)
    gb_mps = bytearray(1 << 16)
    hc_height = 0
    i = 0
    while i < len(order):
        h = glyphs[order[i]].shape[0]
        encode_int(enc, iadh, h - hc_height)
        hc_height = h
        sym_width = 0
        while i < len(order) and glyphs[order[i]].shape[0] == h:
            bm = glyphs[order[i]]
            encode_int(enc, iadw, bm.shape[1] - sym_width)
            sym_width = bm.shape[1]
            encode_generic(bm, template, at, encoder=enc, icx=gb_icx, mps=gb_mps)
            i += 1
        encode_int(enc, iadw, OOB)
    encode_int(enc, iaex, 0)           # skip none,
    encode_int(enc, iaex, len(order))  # export all
    sd_body = enc.flush()
    sd_payload = (
        struct.pack(">H", (template & 3) << 10)
        + b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
        + struct.pack(">II", len(order), len(order))
        + sd_body
    )

    # -- text region: strips of 1 << log_strips rows
    n = len(order)
    strips = 1 << log_strips
    code_len = max(1, (n - 1).bit_length()) if n > 1 else 0
    # T coordinate per the corner anchor: top row (1/3) or bottom (0/2)
    placed = sorted(
        (
            (y if ref_corner & 1 else y + glyphs[g].shape[0] - 1,
             x, id_of[g])
            for g, x, y in placements
        ),
        key=lambda t: (t[0] // strips, t[1]),
    )
    enc = MQEncoder()
    iadt, iafs, iads, iait = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    id_icx = bytearray(1 << (code_len + 1))
    id_mps = bytearray(1 << (code_len + 1))
    encode_int(enc, iadt, 0)  # DT0 -> STRIPT = 0
    strip_id = 0
    first_s = 0
    j = 0
    while j < len(placed):
        sid_t = placed[j][0] // strips
        encode_int(enc, iadt, sid_t - strip_id)
        strip_id = sid_t
        first = True
        cur_s = 0
        while j < len(placed) and placed[j][0] // strips == sid_t:
            t, x, sid = placed[j]
            if first:
                encode_int(enc, iafs, x - first_s)
                first_s = x
                cur_s = first_s
                first = False
            else:
                encode_int(enc, iads, x - cur_s)
                cur_s = x
            if strips > 1:
                encode_int(enc, iait, t - sid_t * strips)
            encode_iaid(enc, id_icx, id_mps, code_len, sid)
            cur_s += glyphs[order[sid]].shape[1] - 1
            j += 1
        encode_int(enc, iads, OOB)
    tr_body = enc.flush()
    tr_flags = ((log_strips & 3) << 2) | ((ref_corner & 3) << 4)
    tr_payload = (
        struct.pack(">IIII", page_w, page_h, 0, 0)
        + b"\x00"  # external comb op: OR
        + struct.pack(">H", tr_flags)
        + struct.pack(">I", len(placed))
        + tr_body
    )

    def seg_header(number: int, seg_type: int, refs: List[int], length: int) -> bytes:
        hdr = struct.pack(">IB", number, seg_type)
        hdr += bytes([len(refs) << 5]) + bytes(refs)
        hdr += b"\x01" + struct.pack(">I", length)  # page 1
        return hdr

    page_info = struct.pack(">IIII", page_w, page_h, 0, 0) + b"\x00" + struct.pack(">H", 0)
    sd_seg = seg_header(1, 0, [], len(sd_payload)) + sd_payload
    page_segs = (
        seg_header(0, 48, [], len(page_info)) + page_info
        + seg_header(2, 6, [1], len(tr_payload)) + tr_payload
    )
    if parts:
        return sd_seg, page_segs
    return (
        seg_header(0, 48, [], len(page_info)) + page_info
        + sd_seg
        + seg_header(2, 6, [1], len(tr_payload)) + tr_payload
    )


# --- embedded-stream segment plumbing ----------------------------------------


def _u32(data: bytes, p: int) -> int:
    return struct.unpack_from(">I", data, p)[0]


def _parse_segment_header(data: bytes, p: int) -> Tuple[Dict, int]:
    number = _u32(data, p)
    flags = data[p + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    p += 5
    rts = data[p]
    count = rts >> 5
    if count == 7:
        count = _u32(data, p) & 0x1FFFFFFF
        p += 4 + (count + 8) // 8  # long form + retain bits
    else:
        p += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    refs = []
    for _ in range(count):
        if ref_size == 1:
            refs.append(data[p])
        elif ref_size == 2:
            refs.append(struct.unpack_from(">H", data, p)[0])
        else:
            refs.append(_u32(data, p))
        p += ref_size
    if page_assoc_4:
        page = _u32(data, p)
        p += 4
    else:
        page = data[p]
        p += 1
    length = _u32(data, p)
    p += 4
    return (
        {"number": number, "type": seg_type, "refs": refs, "page": page, "length": length},
        p,
    )


_COMBINE = {
    0: lambda a, b: a | b,
    1: lambda a, b: a & b,
    2: lambda a, b: a ^ b,
    3: lambda a, b: 1 - (a ^ b),
    4: lambda a, b: b,
}


def _decode_generic_segment(
    payload: bytes, max_pixels: int
) -> Tuple[int, int, int, int, int, np.ndarray]:
    """-> (x, y, w, h, comb_op, bitmap)."""
    if len(payload) < 18:
        raise Jbig2Error("jbig2: truncated region segment")
    w, h, x, y = (_u32(payload, k) for k in (0, 4, 8, 12))
    comb_op = payload[16] & 0x07
    gflags = payload[17]
    mmr = gflags & 1
    template = (gflags >> 1) & 3
    tpgdon = bool(gflags & 8)
    p = 18
    at: List[Tuple[int, int]] = []
    if not mmr:
        n_at = 4 if template == 0 else 1
        for _ in range(n_at):
            ax = struct.unpack_from("b", payload, p)[0]
            ay = struct.unpack_from("b", payload, p + 1)[0]
            at.append((ax, ay))
            p += 2
    if w == 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise Jbig2Error(f"jbig2: bad region size {w}x{h}")
    if w * h > max_pixels:
        raise Jbig2Error(f"jbig2: region {w}x{h} over the pixel budget")
    body = payload[p:]
    if mmr:
        from dedoc_spark.core.ccitt import CcittError, decode_g4

        try:
            img = decode_g4(body, w, rows=h)  # 0 ink / 255 paper
        except CcittError as e:
            raise Jbig2Error(f"jbig2: mmr body failed ({e})")
        bitmap = (img == 0).astype(np.uint8)
        if bitmap.shape[0] < h:
            bitmap = np.vstack(
                [bitmap, np.zeros((h - bitmap.shape[0], w), np.uint8)]
            )
    else:
        bitmap = decode_generic(body, w, h, template, at, tpgdon)
    return x, y, w, h, comb_op, bitmap


def decode_embedded(
    data: bytes, globals_data: bytes = b"", max_pixels: int = 1 << 24
) -> np.ndarray:
    """PDF-embedded JBIG2 stream -> HxW uint8 bitmap (1 = black).

    ``globals_data`` is the /JBIG2Globals stream when present — it is
    walked first, so symbol dictionaries it carries are visible to text
    regions in ``data`` via their referred-to segment numbers."""
    page_w = page_h = None
    page_default = 0
    regions: List[Tuple[int, int, int, int, int, np.ndarray]] = []
    sym_by_seg: Dict[int, List[np.ndarray]] = {}

    def walk(buf: bytes) -> None:
        nonlocal page_w, page_h, page_default
        p = 0
        n = len(buf)
        while p + 11 <= n:
            seg, p2 = _parse_segment_header(buf, p)
            length = seg["length"]
            if length == 0xFFFFFFFF:
                raise Jbig2Error("jbig2: unknown-length segment")
            payload = buf[p2 : p2 + length]
            p = p2 + length
            t = seg["type"]
            if t == 48:  # page info
                pw, ph = _u32(payload, 0), _u32(payload, 4)
                if pw != 0xFFFFFFFF:
                    page_w = pw
                if ph != 0xFFFFFFFF:
                    page_h = ph
                if len(payload) > 16 and payload[16] & 0x04:
                    page_default = 1
            elif t in (38, 39):  # immediate generic region
                regions.append(_decode_generic_segment(payload, max_pixels))
            elif t == 0:  # symbol dictionary
                inputs: List[np.ndarray] = []
                for r in seg["refs"]:
                    inputs.extend(sym_by_seg.get(r, []))
                sym_by_seg[seg["number"]] = decode_symbol_dict(
                    payload, inputs, max_pixels
                )
            elif t in (6, 7):  # immediate text region
                syms: List[np.ndarray] = []
                for r in seg["refs"]:
                    syms.extend(sym_by_seg.get(r, []))
                regions.append(decode_text_region(payload, syms, max_pixels))
            elif t in (4, 16, 20, 22, 23, 36, 40, 42, 43):
                # 4/36 = INTERMEDIATE text/generic regions: per T.88 they
                # feed other segments (refinement, unsupported here) and
                # must never be composited onto the page.
                raise Jbig2Error(f"jbig2: unsupported segment type {t}")
            # 49-53, 62: end-of-page/stripe/file, profiles, tables, ext — skip

    try:
        if globals_data:
            walk(globals_data)
        walk(data)
    except (struct.error, IndexError) as e:
        # truncated headers/payloads surface as unpack/index errors deep
        # in the parsers; fold them into the typed skip channel so a
        # malformed image never fails the whole document.
        raise Jbig2Error(f"jbig2: malformed stream ({e})")
    if not regions:
        raise Jbig2Error("jbig2: no region segment found")
    if page_w is None or page_h is None or page_h == 0:
        page_w = max(x + w for x, y, w, h, _, _ in regions)
        page_h = max(y + h for x, y, w, h, _, _ in regions)
    if page_w * page_h > max_pixels:
        raise Jbig2Error("jbig2: page over the pixel budget")
    page = np.full((page_h, page_w), page_default, dtype=np.uint8)
    for x, y, w, h, op, bm in regions:
        h_fit = min(h, page_h - y)
        w_fit = min(w, page_w - x)
        if h_fit <= 0 or w_fit <= 0:
            continue
        sub = page[y : y + h_fit, x : x + w_fit]
        page[y : y + h_fit, x : x + w_fit] = _COMBINE.get(op, _COMBINE[0])(
            sub, bm[:h_fit, :w_fit]
        ).astype(np.uint8)
    return page


# --- fixture-side embedded-stream writer -------------------------------------


def encode_embedded(
    bitmap: np.ndarray, mmr: bool = False, template: int = 0, tpgdon_unused: bool = False
) -> bytes:
    """Minimal PDF-embedded JBIG2 stream: page info + one immediate
    lossless generic region covering the page. ``bitmap`` is 1=black."""
    h, w = bitmap.shape

    def seg_header(number: int, seg_type: int, length: int) -> bytes:
        return (
            struct.pack(">IB", number, seg_type)
            + b"\x00"  # no referred-to segments
            + b"\x01"  # page association 1
            + struct.pack(">I", length)
        )

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00" + struct.pack(">H", 0)
    out = seg_header(0, 48, len(page_info)) + page_info

    region_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # OR
    if mmr:
        from dedoc_spark.core.ccitt import encode_g4

        body = encode_g4(np.where(bitmap != 0, 0, 255).astype(np.uint8))
        payload = region_info + bytes([0x01]) + body
    else:
        at = _NOMINAL_AT[template]
        flags = (template & 3) << 1
        atb = b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
        body = encode_generic(bitmap, template)
        payload = region_info + bytes([flags]) + atb + body
    out += seg_header(1, 39, len(payload)) + payload
    return out
