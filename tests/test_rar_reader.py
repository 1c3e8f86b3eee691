"""Native RAR container walk (core/rar_extract.py; reference
archive_reader.py:18-55 routes .rar via rarfile+unrar — proprietary
DECOMPRESSION stays a typed error, the CONTAINER walk and stored members
are native).  Header-offset correctness is validated against the
reference's own real rar files (member names + methods parse right);
stored-member extraction uses crafted fixtures in the documented
layouts."""

import struct

import pytest

from dedoc_spark.core.formats import detect_format, list_archive_members
from dedoc_spark.core.rar_extract import list_members

REF_ARCHIVES = "/root/reference/tests/data/archives"


def _rar4_stored(members):
    """Minimal RAR4 archive: signature, MAIN_HEAD, stored file blocks."""
    out = bytearray(b"Rar!\x1a\x07\x00")
    out += struct.pack("<HBHH", 0, 0x73, 0, 13) + b"\x00" * 6  # MAIN_HEAD
    for name, data in members:
        nb = name.encode()
        head_size = 32 + len(nb)
        out += struct.pack(
            "<HBHHIIBIIBBHI",
            0,            # HEAD_CRC (unchecked)
            0x74,         # file header
            0x8000,       # LONG_BLOCK
            head_size,
            len(data),    # PACK_SIZE
            len(data),    # UNP_SIZE (stored)
            0,            # host os
            0,            # file crc (unchecked)
            0,            # ftime
            29,           # unp_ver
            0x30,         # method: store
            len(nb),
            0x20,         # attrs
        )
        out += nb + data
    out += struct.pack("<HBHH", 0, 0x7B, 0, 7)  # archive end
    return bytes(out)


def _vint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _rar5_stored(members):
    """Minimal RAR5 archive: signature, main header, stored file blocks,
    end block (vint-encoded per the published rar5 layout)."""
    out = bytearray(b"Rar!\x1a\x07\x01\x00")

    def block(content, data=b""):
        hdr = _vint(len(content))
        return b"\x00\x00\x00\x00" + hdr + content + data  # crc32 unchecked

    out += block(_vint(1) + _vint(0) + _vint(0))  # main header (type 1)
    for name, data in members:
        nb = name.encode()
        content = (
            _vint(2)            # file header
            + _vint(0x02)       # header flags: data area present
            + _vint(len(data))  # data size
            + _vint(0)          # file flags
            + _vint(len(data))  # unpacked size
            + _vint(0)          # attributes
            + _vint(0)          # compression_info: method 0 = store
            + _vint(0)          # host os
            + _vint(len(nb))
            + nb
        )
        out += block(content, data)
    out += block(_vint(5) + _vint(0) + _vint(0))  # end of archive
    return bytes(out)


@pytest.mark.parametrize("builder", [_rar4_stored, _rar5_stored])
def test_stored_members_extract(builder):
    payload = builder([("a/readme.txt", b"hello rar"), ("data.bin", b"\x00\x01\x02")])
    got = list_members(payload)
    assert got == [("readme.txt", b"hello rar"), ("data.bin", b"\x00\x01\x02")]
    # joins the archive channel end-to-end
    assert detect_format("x.rar", payload, None) == "zip"
    assert list_archive_members(payload) == got


def test_reference_rar4_compressed_members_typed_error():
    """The reference's real rar4 archives: the container walk reaches the
    first member (offsets right → the NAME parses), and its proprietary
    compression raises the typed needs_unpacker error."""
    for fname, member in [
        ("arch_with_attachs.rar", "arch_with_attachs/english_doc.pdf"),
        ("subfolders.rar", "subfolders/english/doc/english_doc.docx"),
    ]:
        payload = open(f"{REF_ARCHIVES}/{fname}", "rb").read()
        with pytest.raises(ValueError, match="needs_unpacker:rar compressed"):
            list_members(payload)
        try:
            list_members(payload)
        except ValueError as e:
            assert member in str(e)


def test_reference_rar5_compressed_members_typed_error():
    payload = open(f"{REF_ARCHIVES}/zipka.rar", "rb").read()
    with pytest.raises(ValueError, match="zipka/ZD-odin.jpg"):
        list_members(payload)


def test_extract_document_rar_error_row():
    """A compressed rar through the per-row reader: typed error row, not
    a crash; a stored rar lists its members in the warnings channel."""
    from dedoc_spark.core.document import extract_document

    compressed = open(f"{REF_ARCHIVES}/zipka.rar", "rb").read()
    d = extract_document("x.rar", compressed, None)
    assert d["error"] is not None and "needs_unpacker:rar" in d["error"]

    stored = _rar4_stored([("inner.txt", b"inner text")])
    d = extract_document("x.rar", stored, None)
    assert d["error"] is not None and "needs_explosion:zip" in d["error"]
    assert any("inner.txt" in w for w in d["warnings"])
