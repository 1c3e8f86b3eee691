"""Legacy .xls (BIFF8 over OLE2 compound file) reader — pure Python.

The reference reads .xls through xlrd (excel_reader.py:15-40); this module
implements the subset xlrd exercises for dedoc's table extraction: OLE2
compound-file stream walk (FAT chains + mini-stream), the Workbook BIFF8
stream, SST shared strings (with CONTINUE-record splits and per-segment
compression flags), and the cell record families LABELSST / NUMBER / RK /
MULRK / LABEL / BOOLERR. One rectangular Table per BOUNDSHEET, page_id =
sheet index — the same output contract as office_extract.extract_xlsx_tables.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Dict, List, Optional, Tuple

from dedoc_spark.core.model import Cell, Line, Table

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD

OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


# --- OLE2 compound file -------------------------------------------------------


def _sector_off(s: int, sector_size: int) -> int:
    # MS-CFB 2.1: sector #0 starts right after the header, which occupies one
    # full sector (512 for v3; padded to 4096 for v4) — i.e. (s+1)*sector_size.
    return (s + 1) * sector_size


def _read_fat(data: bytes, sector_size: int) -> List[int]:
    (num_fat,) = struct.unpack_from("<I", data, 44)
    difat = list(struct.unpack_from("<109I", data, 76))
    fat_sectors = [s for s in difat if s != _FREESECT][:num_fat]
    # DIFAT continuation sectors (documents with >109 FAT sectors).
    # num_difat is untrusted (crafted files put 2^32 here, or loop the
    # chain back on itself) — cap it by file size and track seen sectors.
    (difat_start,) = struct.unpack_from("<I", data, 68)
    (num_difat,) = struct.unpack_from("<I", data, 72)
    num_difat = min(num_difat, len(data) // sector_size + 1)
    per = sector_size // 4 - 1
    s = difat_start
    seen_difat = set()
    for _ in range(num_difat):
        if s in (_ENDOFCHAIN, _FREESECT) or s in seen_difat:
            break
        seen_difat.add(s)
        off = _sector_off(s, sector_size)
        if off + sector_size > len(data):
            break
        entries = struct.unpack_from(f"<{per + 1}I", data, off)
        fat_sectors.extend(e for e in entries[:-1] if e != _FREESECT)
        s = entries[-1]
    fat: List[int] = []
    for fs in fat_sectors:
        off = _sector_off(fs, sector_size)
        if off + sector_size > len(data):
            continue
        fat.extend(struct.unpack_from(f"<{sector_size // 4}I", data, off))
    return fat


def _chain(fat: List[int], start: int) -> List[int]:
    out: List[int] = []
    s = start
    seen = set()
    while s not in (_ENDOFCHAIN, _FREESECT) and s < len(fat) and s not in seen:
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def ole2_streams(data: bytes) -> Dict[str, bytes]:
    """Compound file → {stream_name: bytes} (top-level scan of the
    directory; the red-black tree is irrelevant for lookup by name)."""
    if data[:8] != OLE2_MAGIC:
        raise ValueError("not an OLE2 compound file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    (mini_shift,) = struct.unpack_from("<H", data, 32)
    sector_size = 1 << sector_shift
    mini_size = 1 << mini_shift
    (dir_start,) = struct.unpack_from("<I", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (minifat_start,) = struct.unpack_from("<I", data, 60)
    fat = _read_fat(data, sector_size)

    def read_chain(start: int) -> bytes:
        return b"".join(
            data[_sector_off(s, sector_size) : _sector_off(s + 1, sector_size)]
            for s in _chain(fat, start)
        )

    directory = read_chain(dir_start)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        etype = directory[off + 66]
        if etype == 0 or name_len < 2:
            continue
        name = directory[off : off + name_len - 2].decode("utf-16-le", "ignore")
        start = struct.unpack_from("<I", directory, off + 116)[0]
        size = struct.unpack_from("<I", directory, off + 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = read_chain(root[2]) if root is not None and root[2] not in (_ENDOFCHAIN, _FREESECT) else b""
    minifat: List[int] = []
    if minifat_start not in (_ENDOFCHAIN, _FREESECT):
        raw = read_chain(minifat_start)
        minifat = list(struct.unpack_from(f"<{len(raw) // 4}I", raw))

    out: Dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:
            continue
        if size < mini_cutoff:
            chunks = []
            s = start
            seen = set()
            while s not in (_ENDOFCHAIN, _FREESECT) and s < len(minifat) and s not in seen:
                seen.add(s)
                chunks.append(mini_stream[s * mini_size : (s + 1) * mini_size])
                s = minifat[s]
            out[name] = b"".join(chunks)[:size]
        else:
            out[name] = read_chain(start)[:size]
    return out


# --- BIFF8 --------------------------------------------------------------------


def _records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack_from("<HH", stream, pos)
        yield pos, opcode, stream[pos + 4 : pos + 4 + length]
        pos += 4 + length


class _SstReader:
    """XLUnicodeRichExtendedString reader over SST + CONTINUE payloads.
    Each CONTINUE boundary hit mid-string re-reads the compression flag
    byte (MS-XLS 2.5.293)."""

    def __init__(self, payloads: List[bytes]) -> None:
        self.payloads = payloads
        self.seg = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.payloads[self.seg]) - self.pos

    def _advance_seg(self) -> None:
        self.seg += 1
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if self.seg >= len(self.payloads):
                break
            avail = self._remaining()
            if avail == 0:
                self._advance_seg()
                continue
            take = min(n, avail)
            out += self.payloads[self.seg][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        rich = flags & 0x08
        ext = flags & 0x04
        high = flags & 0x01
        c_run = struct.unpack("<H", self.read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", self.read(4))[0] if ext else 0
        chars: List[str] = []
        left = cch
        while left > 0:
            if self._remaining() == 0:
                if self.seg + 1 >= len(self.payloads):
                    break
                self._advance_seg()
                high = self.read(1)[0] & 0x01  # new grbit per continued segment
            if high:
                take = min(left, self._remaining() // 2)
                if take == 0:
                    # malformed: a lone odd byte before the CONTINUE boundary
                    # (UTF-16 chars never split across segments per MS-XLS);
                    # skip to the next segment or stop — never spin in place.
                    if self.seg + 1 >= len(self.payloads):
                        break
                    self._advance_seg()
                    high = self.read(1)[0] & 0x01
                    continue
                chars.append(self.read(take * 2).decode("utf-16-le", "replace"))
            else:
                take = min(left, self._remaining())
                chars.append(self.read(take).decode("latin-1"))
            left -= take
        self.read(4 * c_run + cb_ext)
        return "".join(chars)


def _parse_sst(payloads: List[bytes]) -> List[str]:
    r = _SstReader(payloads)
    r.read(4)  # total refs
    (unique,) = struct.unpack("<I", r.read(4))
    return [r.read_string() for _ in range(unique)]


def _rk_value(rk: int) -> float:
    mul100 = rk & 0x01
    if rk & 0x02:  # signed 30-bit integer, arithmetic shift
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:  # high 30 bits of an IEEE double
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if mul100 else v


def _num_str(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


def _short_string(payload: bytes, off: int) -> str:
    # BIFF8 XLUnicodeString (LABEL record body)
    cch = struct.unpack_from("<H", payload, off)[0]
    flags = payload[off + 2]
    if flags & 0x01:
        return payload[off + 3 : off + 3 + cch * 2].decode("utf-16-le", "replace")
    return payload[off + 3 : off + 3 + cch].decode("latin-1")


def extract_xls_tables(payload: bytes, url_hash: str = "") -> Tuple[List[Table], List[str]]:
    """One rectangular Table per worksheet of a legacy .xls."""
    streams = ole2_streams(payload)
    book = streams.get("Workbook") or streams.get("Book")
    if book is None:
        raise ValueError("no Workbook stream in OLE2 file")
    warnings: List[str] = []

    # globals pass: SST (+CONTINUE) and BOUNDSHEET offsets
    sst: List[str] = []
    sheets: List[Tuple[int, str]] = []
    sst_payloads: Optional[List[bytes]] = None
    for pos, opcode, body in _records(book):
        if opcode == 0x00FC:  # SST
            sst_payloads = [body]
        elif opcode == 0x003C and sst_payloads is not None:  # CONTINUE
            sst_payloads.append(body)
        elif opcode == 0x0085:  # BOUNDSHEET
            off = struct.unpack_from("<I", body, 0)[0]
            cch = body[6]
            flags = body[7]
            name = (
                body[8 : 8 + cch * 2].decode("utf-16-le", "replace")
                if flags & 0x01
                else body[8 : 8 + cch].decode("latin-1")
            )
            sheets.append((off, name))
        elif opcode == 0x000A and sheets:  # EOF of globals
            break
        elif sst_payloads is not None and opcode not in (0x00FC, 0x003C):
            sst = _parse_sst(sst_payloads)
            sst_payloads = None
    if sst_payloads is not None:
        sst = _parse_sst(sst_payloads)

    tables: List[Table] = []
    for sheet_id, (off, _name) in enumerate(sheets):
        cells_map: Dict[Tuple[int, int], str] = {}
        for _pos, opcode, body in _records(book[off:]):
            if opcode == 0x000A:  # EOF ends the worksheet substream
                break
            if opcode == 0x00FD:  # LABELSST
                row, col, _xf, isst = struct.unpack_from("<HHHI", body, 0)
                cells_map[(row, col)] = sst[isst] if isst < len(sst) else ""
            elif opcode == 0x0203:  # NUMBER
                row, col, _xf = struct.unpack_from("<HHH", body, 0)
                (v,) = struct.unpack_from("<d", body, 6)
                cells_map[(row, col)] = _num_str(v)
            elif opcode == 0x027E:  # RK
                row, col, _xf, rk = struct.unpack_from("<HHHI", body, 0)
                cells_map[(row, col)] = _num_str(_rk_value(rk))
            elif opcode == 0x00BD:  # MULRK
                row, col_first = struct.unpack_from("<HH", body, 0)
                n = (len(body) - 6) // 6
                for i in range(n):
                    (rk,) = struct.unpack_from("<I", body, 4 + i * 6 + 2)
                    cells_map[(row, col_first + i)] = _num_str(_rk_value(rk))
            elif opcode == 0x0204:  # LABEL (BIFF8 string in place)
                row, col, _xf = struct.unpack_from("<HHH", body, 0)
                cells_map[(row, col)] = _short_string(body, 6)
            elif opcode == 0x0205:  # BOOLERR
                row, col, _xf = struct.unpack_from("<HHH", body, 0)
                val, is_err = body[6], body[7]
                cells_map[(row, col)] = "" if is_err else ("TRUE" if val else "FALSE")
        if not cells_map:
            continue
        n_rows = max(r for r, _ in cells_map) + 1
        n_cols = max(c for _, c in cells_map) + 1
        grid = [
            [
                Cell(lines=[Line(line=cells_map.get((r, c), ""), page_id=sheet_id)])
                for c in range(n_cols)
            ]
            for r in range(n_rows)
        ]
        uid = hashlib.md5(f"{url_hash}_xls_table_{sheet_id}".encode()).hexdigest()
        tables.append(Table(cells=grid, page_id=sheet_id, uid=uid))
    return tables, warnings
