"""Native RTF and OpenDocument readers (the reference converts both via
soffice; these parse the open formats directly)."""

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.odf_extract import extract_odp, extract_ods, extract_odt
from dedoc_spark.core.rtf_extract import extract_rtf_text
from dedoc_spark.sources.office_fixture import build_odp, build_ods, build_odt

RTF = (
    "{\\rtf1\\ansi\\ansicpg1251{\\fonttbl{\\f0 Arial;}}{\\stylesheet{\\s1 Head;}}"
    "First paragraph \\b bold run\\b0  after\\par "
    "\\'cf\\'f0\\'e8\\'e2\\'e5\\'f2 codepage\\par "
    "\\u1070?\\u1085?\\u1080? unicode\\line next line\\par "
    "{\\*\\unknowndest hidden stuff}visible\\par}"
).encode("latin-1")


def test_rtf_control_words_and_encodings():
    lines, warnings = extract_rtf_text(RTF)
    assert lines[0] == "First paragraph bold run after"
    assert lines[1] == "Привет codepage"  # ansicpg1251 hex escapes
    assert lines[2] == "Юни unicode"  # \uN with \uc1 fallback skipping
    assert lines[3] == "next line"  # \line
    assert lines[4] == "visible"  # \* destination group skipped
    assert not any("hidden" in ln for ln in lines)
    assert not any("Arial" in ln or "Head" in ln for ln in lines)


def test_rtf_full_pipeline():
    d = extract_document("https://x/r.rtf", RTF, None)
    assert d["error"] is None
    assert "Привет codepage" in d["text_extracted"]
    assert any("natively" in w for w in d["warnings"])


def test_odt_structure():
    odt = build_odt([("h", 1, "Chapter"), ("p", "Body text"), ("h", 2, "Sub"),
                     ("list", ["item one", "item two"])])
    lines, tables, _ = extract_odt(odt, "h")
    assert [(l.line, l.tag_hl.line_type if l.tag_hl else None) for l in lines] == [
        ("Chapter", "header"), ("Body text", "unknown"), ("Sub", "header"),
        ("item one", "list_item"), ("item two", "list_item"),
    ]
    assert (lines[0].tag_hl.level_1, lines[0].tag_hl.level_2) == (1, 1)
    assert (lines[2].tag_hl.level_1, lines[2].tag_hl.level_2) == (1, 2)
    # full pipeline builds a tree with the header as a node
    d = extract_document("https://x/d.odt", odt, None)
    assert d["error"] is None and "Chapter" in d["text_extracted"]


def test_ods_tables():
    ods = build_ods([[["id", "v"], ["1", "x"]], [["only", "second"]]])
    tables, _ = extract_ods(ods, "h")
    assert len(tables) == 2
    assert [[c.get_text() for c in r] for r in tables[0].cells] == [["id", "v"], ["1", "x"]]
    d = extract_document("https://x/d.ods", ods, None)
    assert d["error"] is None and d["n_tables"] == 2


def test_odp_slides():
    odp = build_odp([["Title slide", "body line"], ["Second title"]])
    lines, _, _ = extract_odp(odp, "h")
    assert [(l.line, l.page_id, l.tag_hl.line_type if l.tag_hl else None) for l in lines] == [
        ("Title slide", 0, "header"),
        ("body line", 0, "unknown"),
        ("Second title", 1, "header"),
    ]
    d = extract_document("https://x/d.odp", odp, None)
    assert d["error"] is None and "Second title" in d["text_extracted"]


def test_odt_span_style_annotations():
    """text:span style refs resolve through automatic-styles into
    bold/italic/underlined annotations at exact span offsets."""
    odt = build_odt([
        ("raw", '<text:p>plain <text:span text:style-name="B1">bold part</text:span>'
                ' then <text:span text:style-name="I1">both</text:span></text:p>'),
    ])
    lines, _, _ = extract_odt(odt, "h")
    assert lines[0].line == "plain bold part then both"
    anns = {(a.name): (a.start, a.end) for a in lines[0].annotations}
    assert anns["bold"] == (6, 15)
    assert lines[0].line[6:15] == "bold part"
    assert anns["italic"] == (21, 25) and anns["underlined"] == (21, 25)
    assert lines[0].line[21:25] == "both"
