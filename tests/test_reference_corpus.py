"""Parity checks against the REFERENCE'S OWN test documents and expected
strings (ported from tests/unit_tests/test_format_docx_reader.py:32-60) —
skipped when the reference checkout is absent."""

import os
import pathlib

import pytest

REF_DATA = pathlib.Path("/root/reference/tests/data")

pytestmark = pytest.mark.skipif(not REF_DATA.is_dir(), reason="reference corpus not available")


def test_reference_example_docx_exact_lines():
    """The reference's own assertions on tests/data/docx/example.docx."""
    from dedoc_spark.core.docx_extract import extract_docx

    payload = (REF_DATA / "docx" / "example.docx").read_bytes()
    lines, tables, _ = extract_docx(payload, "h")
    texts = [ln.line.strip() for ln in lines]
    assert texts[0] == "Пример документа"
    assert texts[1] == "Глава 1"
    assert texts[3] == "Статья 1"
    assert texts[5] == "Статья 2"
    assert texts[6] == "Дадим пояснения"
    assert texts[7] == "1.2.1. Поясним за непонятное"
    assert texts[8] == "1.2.2. Поясним за понятное"
    assert texts[9] == "а) это даже ежу понятно"
    assert texts[10] == "б) это ежу не понятно"
    assert texts[11] == "1.2.3."
    assert len(tables) == 2
    # first table annotated on the "Дадим пояснения" line (reference :51-57)
    ann6 = [a.value for a in lines[6].annotations if a.name == "table"]
    assert ann6 == [tables[0].uid]
    ann11 = [a.value for a in lines[11].annotations if a.name == "table"]
    assert ann11 == [tables[1].uid]


def test_reference_corpus_sweep_no_errors():
    """Every real (non-'broken') office document in the reference corpus
    extracts without an error row, and none raises."""
    from dedoc_spark.core.document import extract_document

    exts = {"docx", "pdf", "doc", "rtf", "odt", "ods", "odp", "xls", "xlsx", "ppt", "pptx"}
    checked = 0
    for p in sorted(REF_DATA.rglob("*")):
        if not p.is_file() or p.suffix.lstrip(".").lower() not in exts:
            continue
        d = extract_document(p.name, p.read_bytes(), None)
        if "broken" not in p.name:
            assert d["error"] is None, f"{p.name}: {d['error']}"
        checked += 1
    assert checked > 100
