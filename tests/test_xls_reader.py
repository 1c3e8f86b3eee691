"""Legacy .xls (BIFF8/OLE2) reader tests — the reference reads these via
xlrd (excel_reader.py:15-40); fixtures are hand-built compound files."""

import json

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.formats import detect_format
from dedoc_spark.core.xls_extract import extract_xls_tables, ole2_streams
from dedoc_spark.sources.office_fixture import build_xls


def test_ole2_stream_walk():
    xls = build_xls([[["a"]]])
    streams = ole2_streams(xls)
    assert "Workbook" in streams
    assert streams["Workbook"][:2] == b"\x09\x08"  # BOF record id 0x0809 LE


def test_cell_types_and_sheets():
    xls = build_xls([[["id", "имя"], ["1", 42], [3.5, "ok"]], [["second", "sheet"]]])
    tables, _ = extract_xls_tables(xls, "h")
    assert len(tables) == 2
    grid = [[c.get_text() for c in row] for row in tables[0].cells]
    assert grid == [["id", "имя"], ["1", "42"], ["3.5", "ok"]]
    assert tables[1].page_id == 1
    assert [[c.get_text() for c in row] for row in tables[1].cells] == [["second", "sheet"]]


def test_ragged_rows_rectangularized():
    xls = build_xls([[["a", "b", "c"], ["d"]]])
    tables, _ = extract_xls_tables(xls)
    grid = [[c.get_text() for c in row] for row in tables[0].cells]
    assert grid == [["a", "b", "c"], ["d", "", ""]]


def test_dispatch_by_extension_and_magic():
    xls = build_xls([[["x"]]])
    assert detect_format("https://a/report.xls", xls, None) == "xls"
    # OLE2 magic with a Workbook stream → xls even without the extension
    assert detect_format("https://a/download", xls, None) == "xls"
    d = extract_document("https://a/report.xls", xls, None)
    assert d["error"] is None and d["n_tables"] == 1
    cells = json.loads(d["tables_json"])[0]["cells"]
    assert cells[0][0]["lines"][0]["line"] == "x"


def test_ole2_without_workbook_still_needs_conversion():
    # a .doc-like compound file (no Workbook stream) keeps the typed error
    xls = build_xls([[["x"]]])
    patched = xls.replace("Workbook".encode("utf-16-le"), "WordDocum".encode("utf-16-le"))
    assert detect_format("https://a/download", patched, None) == "needs_conversion:ole2"


def test_sst_odd_byte_segment_terminates():
    """ADVICE r2 (high): a UTF-16 SST segment ending on an odd byte used to
    spin forever (take=0, remaining>=1). Must terminate, best-effort text."""
    import struct

    from dedoc_spark.core.xls_extract import _SstReader

    # string of 4 chars, high-byte; first segment carries 3 bytes of char
    # data (one odd byte stranded), CONTINUE carries the rest
    seg1 = struct.pack("<H", 4) + b"\x01" + "ab".encode("utf-16-le")[:3]
    seg2 = b"\x01" + "cd".encode("utf-16-le")
    r = _SstReader([seg1, seg2])
    s = r.read_string()  # must not hang
    assert s.startswith("a")


def test_sst_odd_byte_last_segment_terminates():
    import struct

    from dedoc_spark.core.xls_extract import _SstReader

    seg = struct.pack("<H", 2) + b"\x01" + "a".encode("utf-16-le") + b"\x42"
    r = _SstReader([seg])
    assert r.read_string() == "a"  # truncated, not hung


def test_difat_self_loop_terminates():
    """ADVICE r2 (medium): a DIFAT chain pointing back at itself with a huge
    num_difat must not hang or OOM."""
    import struct

    from dedoc_spark.core.xls_extract import _read_fat

    data = bytearray(build_xls([[["x"]]]))
    # craft a DIFAT continuation at sector 50 whose next pointer is itself
    need = (1 + 51 + 1) * 512
    data = bytearray(bytes(data).ljust(need, b"\x00"))
    struct.pack_into("<I", data, 68, 50)  # difat_start
    struct.pack_into("<I", data, 72, 0xFFFFFFF0)  # absurd num_difat
    off = (50 + 1) * 512
    struct.pack_into("<128I", data, off, *([0xFFFFFFFF] * 127 + [50]))
    fat = _read_fat(bytes(data), 512)  # must return, not spin
    assert isinstance(fat, list)


def test_ole2_v4_sector_offsets():
    """ADVICE r2 (low): v4 compound files (4096-byte sectors) place sector 0
    at offset 4096, not 512 — offsets are (s+1)*sector_size per MS-CFB."""
    from dedoc_spark.sources.office_fixture import build_ole2

    payload = b"HELLO-V4" * 700  # > one 4096 sector
    blob = build_ole2({"Workbook": payload}, sector_shift=12)
    streams = ole2_streams(blob)
    assert streams["Workbook"][: len(payload)] == payload


def test_xls_inside_v4_container():
    import struct

    from dedoc_spark.sources.office_fixture import build_ole2

    # rebuild the same Workbook stream into a v4 container
    v3 = build_xls([[["a", "b"], ["1", "2"]]])
    workbook = ole2_streams(v3)["Workbook"]
    v4 = build_ole2({"Workbook": workbook}, sector_shift=12)
    tables, _ = extract_xls_tables(v4)
    grid = [[c.get_text() for c in row] for row in tables[0].cells]
    assert grid == [["a", "b"], ["1", "2"]]
