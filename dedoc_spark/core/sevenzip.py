"""Native .7z reader (and a fixture writer) — pure Python + stdlib lzma.

The reference unpacks 7z by shelling out to py7zr
(dedoc/readers/archive_reader/archive_reader.py); this module implements
the subset of the public 7z format (7-Zip's 7zFormat.txt) that covers
ordinary archives: raw or LZMA-encoded headers, single-coder folders with
COPY (00), LZMA2 (21) or LZMA1 (030101) coders, optional BCJ-free solid
blocks with multiple substreams, and the FilesInfo name/empty-stream
property blocks. Encrypted archives, multi-coder bind chains and BCJ
filters raise ValueError — callers route that to the typed error channel.

list_members(payload) -> [(name, bytes)]
build_7z(members, codec) -> bytes      (fixture writer: 'copy' | 'lzma2')
"""

from __future__ import annotations

import lzma
import struct
import zlib
from typing import List, Optional, Tuple

MAGIC = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_CODERS_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17
_K_DUMMY = 0x19


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("7z: truncated header")
        self.pos += n
        return out

    def number(self) -> int:
        """7z variable-length number (7zFormat.txt REAL_UINT64)."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if first & mask == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bit_vector(self, n: int) -> List[bool]:
        out: List[bool] = []
        b = 0
        mask = 0
        for _ in range(n):
            if mask == 0:
                b = self.byte()
                mask = 0x80
            out.append(bool(b & mask))
            mask >>= 1
        return out

    def bool_vector_all_defined(self, n: int) -> List[bool]:
        return [True] * n if self.byte() else self.bit_vector(n)


# hard ceiling on a single folder's declared unpack size (decompression-bomb
# guard); raised errors surface through the typed archive error channel
MAX_UNPACK_BYTES = 1 << 28  # 256 MiB


class _Folder:
    __slots__ = ("coder_id", "props", "unpack_sizes", "num_substreams", "substream_sizes")

    def __init__(self) -> None:
        self.coder_id = b""
        self.props = b""
        self.unpack_sizes: List[int] = []
        self.num_substreams = 1
        self.substream_sizes: List[int] = []

    @property
    def unpack_size(self) -> int:
        return self.unpack_sizes[-1] if self.unpack_sizes else 0

    def decode(self, packed: bytes, max_bytes: int = MAX_UNPACK_BYTES) -> bytes:
        # the header's unpack_size is UNTRUSTED: a tiny crafted archive
        # claiming a multi-GB output would otherwise allocate that much on
        # the executor (decompression bomb) — bound it like _lzw_decode does
        if self.unpack_size > max_bytes:
            raise ValueError(
                f"7z: declared unpack size {self.unpack_size} exceeds cap {max_bytes}"
            )
        if self.coder_id == b"\x00":  # COPY
            return packed[: self.unpack_size]
        if self.coder_id == b"\x21":  # LZMA2
            dict_size = _lzma2_dict_size(self.props[0] if self.props else 40)
            dec = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}],
            )
            return dec.decompress(packed, max_length=self.unpack_size)
        if self.coder_id == b"\x03\x01\x01":  # LZMA1
            if len(self.props) < 5:
                raise ValueError("7z: LZMA1 coder missing properties")
            pb_lp_lc = self.props[0]
            lc = pb_lp_lc % 9
            lp = (pb_lp_lc // 9) % 5
            pb = pb_lp_lc // 45
            (dict_size,) = struct.unpack("<I", self.props[1:5])
            dec = lzma.LZMADecompressor(
                format=lzma.FORMAT_RAW,
                filters=[{
                    "id": lzma.FILTER_LZMA1,
                    "dict_size": max(dict_size, 4096),
                    "lc": lc, "lp": lp, "pb": pb,
                }],
            )
            return dec.decompress(packed, max_length=self.unpack_size)
        raise ValueError(f"7z: unsupported coder {self.coder_id.hex()}")


def _lzma2_dict_size(prop: int) -> int:
    if prop > 40:
        raise ValueError("7z: invalid LZMA2 dictionary property")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _read_streams_info(r: _Reader):
    """kPackInfo/kUnpackInfo/kSubStreamsInfo → (pack_pos, pack_sizes, folders)."""
    pack_pos = 0
    pack_sizes: List[int] = []
    folders: List[_Folder] = []
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            pack_pos = r.number()
            num_pack = r.number()
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    pack_sizes = [r.number() for _ in range(num_pack)]
                elif t2 == _K_CRC:
                    defined = r.bool_vector_all_defined(num_pack)
                    r.bytes(4 * sum(defined))
                else:
                    raise ValueError(f"7z: unexpected PackInfo property {t2}")
        elif t == _K_UNPACK_INFO:
            t2 = r.number()
            if t2 != _K_FOLDER:
                raise ValueError("7z: UnpackInfo must start with kFolder")
            num_folders = r.number()
            if r.byte() != 0:
                raise ValueError("7z: external folder data not supported")
            for _ in range(num_folders):
                folder = _Folder()
                num_coders = r.number()
                if num_coders != 1:
                    raise ValueError("7z: multi-coder folders not supported")
                flags = r.byte()
                id_size = flags & 0x0F
                folder.coder_id = r.bytes(id_size)
                if flags & 0x10:  # complex: in/out stream counts
                    r.number()
                    r.number()
                if flags & 0x20:  # attributes
                    folder.props = r.bytes(r.number())
                folders.append(folder)
            t2 = r.number()
            if t2 != _K_CODERS_UNPACK_SIZE:
                raise ValueError("7z: missing kCodersUnpackSize")
            for folder in folders:
                folder.unpack_sizes = [r.number()]  # one coder → one out stream
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_CRC:
                    defined = r.bool_vector_all_defined(len(folders))
                    r.bytes(4 * sum(defined))
                else:
                    raise ValueError(f"7z: unexpected UnpackInfo property {t2}")
        elif t == _K_SUBSTREAMS:
            counts_given = False
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_NUM_UNPACK_STREAM:
                    counts_given = True
                    for folder in folders:
                        folder.num_substreams = r.number()
                elif t2 == _K_SIZE:
                    for folder in folders:
                        sizes = [r.number() for _ in range(folder.num_substreams - 1)]
                        sizes.append(folder.unpack_size - sum(sizes))
                        folder.substream_sizes = sizes
                elif t2 == _K_CRC:
                    total = sum(
                        f.num_substreams for f in folders
                    ) if counts_given else len(folders)
                    defined = r.bool_vector_all_defined(total)
                    r.bytes(4 * sum(defined))
                else:
                    raise ValueError(f"7z: unexpected SubStreams property {t2}")
        else:
            raise ValueError(f"7z: unexpected StreamsInfo property {t}")
    for folder in folders:
        if not folder.substream_sizes:
            folder.substream_sizes = [folder.unpack_size]
    return pack_pos, pack_sizes, folders


def _read_files_info(r: _Reader) -> Tuple[List[str], List[bool], List[bool]]:
    num_files = r.number()
    names: List[str] = []
    empty_stream = [False] * num_files
    empty_file_bits: List[bool] = []
    while True:
        t = r.number()
        if t == _K_END:
            break
        size = r.number()
        end = r.pos + size
        if t == _K_NAME:
            if r.byte() != 0:
                raise ValueError("7z: external names not supported")
            raw = r.bytes(end - r.pos)
            names = [n for n in raw.decode("utf-16-le").split("\x00") if n != ""]
        elif t == _K_EMPTY_STREAM:
            empty_stream = r.bit_vector(num_files)
            r.pos = end
        elif t == _K_EMPTY_FILE:
            # one bit per EMPTY-STREAM entry: set = genuinely empty FILE,
            # clear = directory (7zFormat.txt FilesInfo)
            empty_file_bits = r.bit_vector(sum(empty_stream))
            r.pos = end
        else:  # kDummy, attributes, times … skip
            r.pos = end
    # per-file is_dir: empty stream and NOT flagged as empty file
    is_dir = [False] * num_files
    ei = 0
    for i in range(num_files):
        if empty_stream[i]:
            flagged_empty = empty_file_bits[ei] if ei < len(empty_file_bits) else False
            is_dir[i] = not flagged_empty
            ei += 1
    return names, empty_stream, is_dir


def list_members(payload: bytes, max_members: int = 1000) -> List[Tuple[str, bytes]]:
    """7z archive → [(member_name, bytes)] for the row-explosion channel."""
    if payload[:6] != MAGIC:
        raise ValueError("not a 7z archive")
    next_off, next_size = struct.unpack_from("<QQ", payload, 12)
    base = 32
    header = payload[base + next_off : base + next_off + next_size]
    if not header:
        raise ValueError("7z: empty header")
    r = _Reader(header)
    t = r.number()
    if t == _K_ENCODED_HEADER:
        pack_pos, pack_sizes, folders = _read_streams_info(r)
        if not folders or not pack_sizes:
            raise ValueError("7z: malformed encoded header")
        packed = payload[base + pack_pos : base + pack_pos + pack_sizes[0]]
        r = _Reader(folders[0].decode(packed))
        t = r.number()
    if t != _K_HEADER:
        raise ValueError("7z: missing header marker")
    folders: List[_Folder] = []
    pack_pos = 0
    pack_sizes = []
    names: List[str] = []
    empty_stream: List[bool] = []
    is_dir: List[bool] = []
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders = _read_streams_info(r)
        elif t == _K_FILES_INFO:
            names, empty_stream, is_dir = _read_files_info(r)
        else:
            raise ValueError(f"7z: unexpected header property {t}")

    # decode folders in pack order (one pack stream per folder here)
    contents: List[bytes] = []
    offset = pack_pos
    for folder, psize in zip(folders, pack_sizes):
        packed = payload[base + offset : base + offset + psize]
        offset += psize
        data = folder.decode(packed)
        cursor = 0
        for ssize in folder.substream_sizes:
            contents.append(data[cursor : cursor + ssize])
            cursor += ssize

    out: List[Tuple[str, bytes]] = []
    ci = 0
    for i, name in enumerate(names):
        if i < len(empty_stream) and empty_stream[i]:
            if not (i < len(is_dir) and is_dir[i]):  # skip directories
                out.append((name, b""))
            continue
        if ci < len(contents):
            out.append((name, contents[ci]))
            ci += 1
    return out[:max_members]


# --- fixture writer -----------------------------------------------------------


def _w_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    return b"\xff" + struct.pack("<Q", v)


def build_7z(members: List[Tuple[str, bytes]], codec: str = "lzma2") -> bytes:
    """Minimal valid .7z: one solid folder (COPY or raw-LZMA2 coder)
    holding the concatenated members, raw (unencoded) header."""
    blob = b"".join(data for _, data in members)
    if codec == "copy":
        packed = blob
        coder = bytes([0x01, 0x00])  # id size 1, no attrs; id 00
    elif codec == "lzma2":
        dict_prop = 16  # 1 MiB
        packed = lzma.compress(
            blob,
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": _lzma2_dict_size(dict_prop)}],
        )
        coder = bytes([0x21, 0x21]) + _w_number(1) + bytes([dict_prop])
    else:
        raise ValueError(codec)

    h = bytearray()
    h += _w_number(_K_HEADER)
    h += _w_number(_K_MAIN_STREAMS)
    # PackInfo
    h += _w_number(_K_PACK_INFO) + _w_number(0) + _w_number(1)
    h += _w_number(_K_SIZE) + _w_number(len(packed)) + _w_number(_K_END)
    # UnpackInfo
    h += _w_number(_K_UNPACK_INFO) + _w_number(_K_FOLDER) + _w_number(1) + b"\x00"
    h += _w_number(1) + coder  # one coder
    h += _w_number(_K_CODERS_UNPACK_SIZE) + _w_number(len(blob)) + _w_number(_K_END)
    # SubStreamsInfo
    h += _w_number(_K_SUBSTREAMS) + _w_number(_K_NUM_UNPACK_STREAM) + _w_number(len(members))
    h += _w_number(_K_SIZE)
    for _, data in members[:-1]:
        h += _w_number(len(data))
    h += _w_number(_K_END)
    h += _w_number(_K_END)  # end MainStreams
    # FilesInfo
    names_raw = b"".join(name.encode("utf-16-le") + b"\x00\x00" for name, _ in members)
    h += _w_number(_K_FILES_INFO) + _w_number(len(members))
    h += _w_number(_K_NAME) + _w_number(len(names_raw) + 1) + b"\x00" + names_raw
    h += _w_number(_K_END)
    h += _w_number(_K_END)  # end Header

    header = bytes(h)
    next_off = len(packed)
    start = struct.pack("<QQI", next_off, len(header), zlib.crc32(header) & 0xFFFFFFFF)
    sig = MAGIC + bytes([0, 4]) + struct.pack("<I", zlib.crc32(start) & 0xFFFFFFFF) + start
    assert len(sig) == 32
    return sig + packed + header
