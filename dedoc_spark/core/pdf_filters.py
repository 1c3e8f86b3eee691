"""Legacy PDF stream filters: LZWDecode and RunLengthDecode.

Pure-python ports of the two non-Flate lossless filters older scanned
PDFs carry (PDF 32000-1:2008 §7.4.2 / §7.4.5); the LZW variant is the
MSB-first 9..12-bit code stream with Clear=256 / EOD=257 and the
EarlyChange=1 default (code width grows one code early). Validated
against the specification's own worked example
(45 45 45 45 45 65 45 45 45 66 <-> 80 0B 60 50 22 0C 0C 85 01).
"""

from __future__ import annotations

from typing import Dict


class PdfFilterError(ValueError):
    pass


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZWDecode (§7.4.2): variable-width MSB-first codes."""
    out = bytearray()
    table: Dict[int, bytes] = {}
    width = 9
    next_code = 258
    prev: bytes = b""
    acc = 0
    nacc = 0
    for byte in data:
        acc = (acc << 8) | byte
        nacc += 8
        while nacc >= width:
            nacc -= width
            code = (acc >> nacc) & ((1 << width) - 1)
            if code == 256:  # clear table
                table.clear()
                width = 9
                next_code = 258
                prev = b""
                continue
            if code == 257:  # EOD
                return bytes(out)
            if code < 256:
                entry = bytes([code])
            elif code in table:
                entry = table[code]
            elif code == next_code and prev:
                entry = prev + prev[:1]
            else:
                raise PdfFilterError(f"invalid LZW code {code}")
            out += entry
            if prev:
                table[next_code] = prev + entry[:1]
                next_code += 1
            prev = entry
            # early-change convention (xpdf LZWStream): the width grows
            # when next_code + EarlyChange reaches the current capacity —
            # the decoder lags the encoder's table by exactly one entry
            if next_code + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Fixture-side LZW writer (round-trip tests only).

    The dictionary keys on (prefix code, next byte) pairs — the classic
    LZW automaton — instead of the byte-string prefixes themselves:
    byte-for-byte the same code stream, but hashing a 2-int tuple is
    O(1) where hashing ever-longer prefix strings made the encoder
    quadratic in the length of repetitive runs (a flat scan raster is
    exactly that).

    Runs of one repeated byte — most of a scan raster is 0x00/0xFF
    paper — additionally skip the per-byte automaton walk: the codes
    for b, bb, bbb, ... form a chain (each table hit steps one link),
    so a cached per-byte chain list jumps to the chain's end in O(1)
    and only the O(sqrt(run)) dictionary misses run the normal emit/
    insert path. The chain list mirrors the table exactly (entries
    appended whenever ANY path inserts (chain_end, b); cleared on
    Clear), so the emitted code stream is byte-identical to the
    per-byte walk."""
    table: Dict[int, int] = {}  # (prefix_code << 8 | byte) -> code
    chains: Dict[int, list] = {}  # byte -> [code(b), code(bb), ...]
    next_code = 258
    width = 9
    chunks = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            chunks.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1

    emit(256)
    data = bytes(data)
    # run boundaries: starts[i] is the first index of run i
    if len(data) > 1:
        import numpy as np

        arr = np.frombuffer(data, dtype=np.uint8)
        starts = np.concatenate(
            [[0], np.nonzero(arr[1:] != arr[:-1])[0] + 1, [len(data)]]
        ).tolist()
    else:
        starts = [0, len(data)]

    seq_code = -1  # code of the current prefix; single bytes are their own code
    for ri in range(len(starts) - 1):
        i = starts[ri]
        end = starts[ri + 1]
        if i >= end:
            continue
        byte = data[i]
        # normal per-byte walk until the prefix resets to the bare run
        # byte (a miss) — transitions into a run ride mixed-prefix table
        # entries that the chain cache cannot represent
        while i < end:
            if seq_code < 0:
                seq_code = byte
                i += 1
                continue
            key = (seq_code << 8) | byte
            hit = table.get(key)
            if hit is not None:
                seq_code = hit
                i += 1
                continue
            emit(seq_code)
            if next_code + early_change >= (1 << 12):
                # table full: Clear before any code could outgrow 12 bits
                emit(256)
                table.clear()
                chains.clear()
                next_code = 258
                width = 9
            else:
                table[key] = next_code
                # keep the pure-run chain an exact mirror of the table:
                # this insert extends it iff its prefix IS the chain end
                # (inserting b^2 may have to create the chain first)
                ch = chains.get(byte)
                if ch is not None:
                    if ch[-1] == seq_code:
                        ch.append(next_code)
                elif seq_code == byte:
                    chains[byte] = [byte, next_code]
                next_code += 1
                # one behind the decoder's check (its table lags one entry)
                if next_code + early_change - 1 >= (1 << width) and width < 12:
                    width += 1
            seq_code = byte
            i += 1
            break
        # fast path: seq_code == byte means the prefix is b^1 = chain[0];
        # every subsequent byte of the run follows the chain
        while i < end and seq_code == byte:
            ch = chains.get(byte)
            if ch is None:
                ch = chains[byte] = [byte]
            # seq_code == byte == ch[0]: jump straight to the chain end
            # (each link is a guaranteed table hit consuming one byte)
            take = len(ch) - 1
            if take > end - i:
                take = end - i
            if take:
                seq_code = ch[take]
                i += take
            if i >= end:
                break
            # at the chain end with another b pending: guaranteed miss
            emit(seq_code)
            if next_code + early_change >= (1 << 12):
                emit(256)
                table.clear()
                chains.clear()
                next_code = 258
                width = 9
            else:
                table[(seq_code << 8) | byte] = next_code
                ch.append(next_code)
                next_code += 1
                if next_code + early_change - 1 >= (1 << width) and width < 12:
                    width += 1
            seq_code = byte
            i += 1
    if seq_code >= 0:
        emit(seq_code)
    # the decoder adds one last entry after the final data code and
    # re-checks its width before reading EOD — mirror that exactly
    if next_code + early_change >= (1 << width) and width < 12:
        width += 1
    emit(257)
    if nacc:
        chunks.append((acc << (8 - nacc)) & 0xFF)
    return bytes(chunks)


def runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): L<128 copies L+1 literals, L>128
    repeats the next byte 257-L times, 128 is EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            out += data[i : i + length + 1]
            i += length + 1
        else:
            if i >= n:
                raise PdfFilterError("truncated run")
            out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


def runlength_encode(data: bytes) -> bytes:
    """Fixture-side RunLength writer (round-trip tests only).

    Byte-identical to the original greedy per-byte scanner, but driven
    by the maximal-run list (one numpy diff over the buffer) so cost is
    O(runs), not O(bytes) — a scan raster is a few ink transitions per
    row. Greedy semantics preserved exactly: runs emit in 128-chunks, a
    length-129-mod-128 leftover single byte joins the following literal
    stretch, literal stretches chunk at 128."""
    import numpy as np

    n = len(data)
    if n == 0:
        return b"\x80"
    arr = np.frombuffer(data, dtype=np.uint8)
    starts = np.concatenate(([0], np.nonzero(np.diff(arr))[0] + 1))
    lengths = np.diff(np.concatenate((starts, [n]))).tolist()
    starts = starts.tolist()
    out = bytearray()
    lit = bytearray()

    def flush_lit() -> None:
        nonlocal out
        o = 0
        while o < len(lit):
            chunk = lit[o : o + 128]
            out.append(len(chunk) - 1)
            out += chunk
            o += 128
        lit.clear()

    for s, L in zip(starts, lengths):
        v = data[s]
        while L >= 2:
            r = L if L < 128 else 128
            if r < 2:
                break
            flush_lit()
            out += bytes((257 - r, v))
            L -= r
        if L == 1:
            lit.append(v)
    flush_lit()
    out.append(128)
    return bytes(out)
