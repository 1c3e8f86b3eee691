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
