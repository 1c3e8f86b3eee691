"""Legacy binary .doc (piece table) and .ppt (record scan) readers —
native best-effort replacements for the reference's soffice conversion."""

from dedoc_spark.core.doc_extract import extract_doc_text, extract_ppt_texts
from dedoc_spark.core.document import extract_document
from dedoc_spark.core.formats import detect_format
from dedoc_spark.sources.office_fixture import build_doc, build_ppt


def test_doc_piece_table_both_encodings():
    """cp1252-compressed and UTF-16LE pieces concatenate in CP order;
    paragraph marks split lines."""
    paras = ["First ascii paragraph", "Second one", "Русский абзац с юникодом"]
    lines, warnings = extract_doc_text(build_doc(paras))
    assert lines == paras
    assert any("soffice" in w for w in warnings)


def test_ppt_text_atoms():
    texts, _ = extract_ppt_texts(build_ppt(["Slide one title", "Вторая страница"]))
    assert texts == ["Slide one title", "Вторая страница"]


def test_dispatch_doc_ppt_by_magic_and_ext():
    doc = build_doc(["hello word binary"])
    ppt = build_ppt(["hello ppt binary"])
    assert detect_format("https://x/r.doc", doc, None) == "doc"
    assert detect_format("https://x/download", doc, None) == "doc"  # stream sniff
    assert detect_format("https://x/r.ppt", ppt, None) == "ppt"
    assert detect_format("https://x/download", ppt, None) == "ppt"


def test_full_pipeline_doc_and_ppt():
    d = extract_document("https://x/r.doc", build_doc(["Заголовок", "тело документа"]), None)
    assert d["error"] is None
    assert "Заголовок" in d["text_extracted"] and "тело документа" in d["text_extracted"]
    assert any("natively" in w for w in d["warnings"])

    d = extract_document("https://x/r.ppt", build_ppt(["Slide text body"]), None)
    assert d["error"] is None and "Slide text body" in d["text_extracted"]


def test_unparseable_doc_keeps_typed_row():
    junk = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100
    d = extract_document("https://x/r.doc", junk, None)
    assert d["error"] == "needs_conversion:doc"
    assert any("native parse failed" in w for w in d["warnings"])
