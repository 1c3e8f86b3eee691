"""Linear constructor, user patterns, metadata extractors."""

from dedoc_spark.core.constructors import assign_levels_with_patterns, construct_linear
from dedoc_spark.core.metadata import convert_pdf_date, extract_docx_metadata, extract_pdf_metadata
from dedoc_spark.core.model import HierarchyLevel, Line
from dedoc_spark.core.structure import assign_hierarchy_levels
from dedoc_spark.core.tree import tree_to_text


def _lines(texts):
    out = [Line(line=t, line_id=i) for i, t in enumerate(texts)]
    return out


def test_linear_constructor_flat():
    lines = _lines(["a\n", "1. b\n", "c\n"])
    assign_hierarchy_levels(lines)
    root = construct_linear(lines)
    assert [c.text for c in root.subparagraphs] == ["a\n", "1. b\n", "c\n"]
    assert all(c.node_id.count(".") == 1 for c in root.subparagraphs)


def test_user_patterns_regexp():
    lines = _lines(["chapter 1. intro", "body text", "part 1.1. details"])
    patterns = [
        {"name": "regexp", "regexp": r"^chapter\s\d+\.", "line_type": "chapter", "level_1": 1, "can_be_multiline": "false"},
        {"name": "regexp", "regexp": r"^part\s\d+\.\d+\.", "line_type": "part", "level_1": 2, "can_be_multiline": "false"},
    ]
    assign_levels_with_patterns(lines, patterns)
    assert lines[0].hl.line_type == "chapter" and lines[0].hl.level_1 == 1
    assert lines[1].hl.line_type == "raw_text"
    assert lines[2].hl.line_type == "part" and lines[2].hl.level_1 == 2


def test_user_patterns_start_word_and_dotted():
    lines = _lines(["TOTAL: 42", "1.2.3. dotted"])
    patterns = [
        {"name": "start_word", "start_word": "total", "line_type": "footer", "level_1": 3},
        {"name": "dotted_list", "line_type": "list_item", "level_1": 2, "can_be_multiline": "false"},
    ]
    assign_levels_with_patterns(lines, patterns)
    assert lines[0].hl.line_type == "footer"
    assert (lines[1].hl.level_1, lines[1].hl.level_2) == (2, 3)


def test_user_patterns_tag_passthrough():
    line = Line(line="Header text", tag_hl=HierarchyLevel(1, 2, False, "header"))
    assign_levels_with_patterns([line], [{"name": "tag_header", "level_1": 1, "can_be_multiline": "false"}])
    assert line.hl.line_type == "header" and line.hl.level_2 == 2


def test_pdf_date_conversion():
    assert convert_pdf_date("D:20240101000000Z") == 1704067200
    assert convert_pdf_date("D:20240101010000+01'00'") == 1704067200
    assert convert_pdf_date("D:2024") == 1704067200
    assert convert_pdf_date("garbage") is None


def test_pdf_metadata():
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Title (My Doc) /Producer (genpdf) "
        b"/CreationDate (D:20240101000000Z) >>\nendobj\n"
        b"trailer\n<< /Root 2 0 R /Info 1 0 R >>\n"
    )
    meta = extract_pdf_metadata(pdf)
    assert meta["title"] == "My Doc"
    assert meta["producer"] == "genpdf"
    assert meta["creationdate"] == "1704067200"


def test_docx_metadata():
    import io
    import zipfile

    core = (
        '<?xml version="1.0"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/">'
        "<dc:title>T</dc:title><dc:creator>A</dc:creator>"
        "<dcterms:created>2024-01-01T00:00:00Z</dcterms:created></cp:coreProperties>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("docProps/core.xml", core)
    meta = extract_docx_metadata(buf.getvalue())
    assert meta == {"title": "T", "creator": "A", "created": "2024-01-01T00:00:00Z"}


def test_json2html_rendering():
    """Debug HTML rendering parity (api_utils.py:114-260): strong headers,
    em list items, &nbsp; indents with node ids, annotation span tags, and
    a bordered tables section with hidden merged-cell clones."""
    from dedoc_spark.core.json2html import json2html
    from dedoc_spark.core.model import Annotation, Cell, HierarchyLevel, Line, Table
    from dedoc_spark.core.structure import assign_hierarchy_levels
    from dedoc_spark.core.tree import construct_tree

    lines = [
        Line(line="Title", tag_hl=HierarchyLevel(1, 1, False, "header")),
        Line(line="bold body", annotations=[Annotation(0, 4, "bold", "True")]),
        Line(line="1. item", line_id=2),
    ]
    for i, ln in enumerate(lines):
        ln.line_id = i
    assign_hierarchy_levels(lines)
    tree = construct_tree(lines)
    cells = [[Cell(lines=[Line(line="A")]), Cell(lines=[Line(line="B")], invisible=True)]]
    table = Table(cells=cells, page_id=0, uid="tuid1")
    html = json2html(tree, [table])
    assert "<strong>Title</strong>" in html
    assert "<b>bold</b>" in html
    assert "<em>1. item</em>" in html
    assert "id = 0.0 ; type = header" in html
    assert '<table border="1" id=tuid1' in html
    assert 'style="display: none"' in html
    assert "<h3> Tables: </h3>" in html


def test_ole2_summary_information_metadata():
    """Legacy doc/xls/ppt metadata from the SummaryInformation property set
    (MS-OLEPS): the compound-file analogue of docx core.xml."""
    from dedoc_spark.core.metadata import extract_ole2_metadata
    from dedoc_spark.sources.office_fixture import build_ole2, build_summary_info

    si = build_summary_info({
        "title": "Отчёт Q3", "author": "A. Writer", "keywords": "spark,docs",
        "created_time": 1700000000, "modified_time": 1700100000,
    })
    ole = build_ole2({"Workbook": b"\x09\x08" + b"\x00" * 64, "\x05SummaryInformation": si})
    meta = extract_ole2_metadata(ole)
    assert meta["title"] == "Отчёт Q3"  # VT_LPWSTR path
    assert meta["author"] == "A. Writer"
    assert meta["keywords"] == "spark,docs"
    assert meta["created_time"] == "1700000000"
    assert meta["modified_time"] == "1700100000"
    # files without the stream or non-OLE2 payloads → empty dict
    assert extract_ole2_metadata(build_ole2({"Workbook": b"\x09\x08"})) == {}
    assert extract_ole2_metadata(b"not ole2") == {}


def test_json2tree_rendering():
    """Flat indented debug tree (api_utils.py:79-106): bottom-up emission
    with |-guides, dashes at node depth, root text in <h3>."""
    from dedoc_spark.core.json2html import json2tree
    from dedoc_spark.core.model import HierarchyLevel, Line
    from dedoc_spark.core.structure import assign_hierarchy_levels
    from dedoc_spark.core.tree import construct_tree

    lines = [
        Line(line="Title", tag_hl=HierarchyLevel(1, 1, False, "header")),
        Line(line="body text", line_id=1),
    ]
    for i, ln in enumerate(lines):
        ln.line_id = i
    assign_hierarchy_levels(lines)
    tree = construct_tree(lines)
    out = json2tree(tree)
    # root text heads the document
    assert out.startswith("<h3></h3>")
    # depth-1 node: dash run with the open-depth guide overwriting col 0
    assert "<p> <tt> <em>  |--- header&nbsp0.0 </em> </tt> </p>" in out
    assert "<p> <tt> |&nbsp&nbsp&nbsp Title </tt> </p>" in out
    # node order: header (0.0) before its raw_text child (0.0.0)
    assert out.index("header&nbsp0.0 ") < out.index("raw_text&nbsp0.0.0 ")
    # depth-2 node: indented dash run, guide at its own depth column
    assert "&nbsp&nbsp&nbsp&nbsp|--- raw_text&nbsp0.0.0" in out


def test_json2collapsed_tree_rendering():
    """<details>-nested rendering (api_utils.py:30-76): parents render as
    <summary>, leaves as plain <p>, 60-char prettify wrap."""
    from dedoc_spark.core.json2html import json2collapsed_tree
    from dedoc_spark.core.model import HierarchyLevel, Line
    from dedoc_spark.core.structure import assign_hierarchy_levels
    from dedoc_spark.core.tree import construct_tree

    long_text = " ".join(["word"] * 30)  # forces the 60-char wrap
    lines = [
        Line(line="Head", tag_hl=HierarchyLevel(1, 1, False, "header")),
        Line(line=long_text, line_id=1),
    ]
    for i, ln in enumerate(lines):
        ln.line_id = i
    assign_hierarchy_levels(lines)
    tree = construct_tree(lines)
    out = json2collapsed_tree(tree)
    assert "<!DOCTYPE html>" in out and "<title>details</title>" in out
    assert "<details>" in out and "<summary>" in out
    assert "---- header&nbsp0.0" in out
    # leaf raw_text paragraph is NOT a <details> (no children)
    assert "raw_text&nbsp0.0.0" in out
    wrapped = [seg for seg in out.split("<p>") if "word word" in seg]
    assert len(wrapped) >= 2  # 150 chars of words wraps into ≥2 <p> blocks


def test_return_format_param():
    """return_format (dedoc_api.py:75-105) is a response-representation
    switch: the opt-in "rendered" key carries the html/tree/plain_text/
    pretty_json renderings; default json output is unchanged (no key)."""
    import json as jsonlib

    from dedoc_spark.core.document import extract_document

    html = b"<html><body><h1>Title</h1><p>body text</p></body></html>"
    base = extract_document("a.html", html, None)
    assert "rendered" not in base

    d = extract_document("a.html", html, None, params={"return_format": "html"})
    assert "<strong>" in d["rendered"] and "body text" in d["rendered"]
    # everything except the extra key matches the default output
    assert {k: v for k, v in d.items() if k != "rendered"} == base

    d = extract_document("a.html", html, None, params={"return_format": "plain_text"})
    assert d["rendered"] == base["text_extracted"]

    d = extract_document("a.html", html, None, params={"return_format": "tree"})
    assert "|--- header" in d["rendered"] and "Title" in d["rendered"]

    d = extract_document("a.html", html, None, params={"return_format": "collapsed_tree"})
    assert "Title" in d["rendered"]

    d = extract_document("a.html", html, None, params={"return_format": "pretty_json"})
    parsed = jsonlib.loads(d["rendered"])
    assert parsed["content"]["structure"]["subparagraphs"]
    # pretty has indentation, ujson does not
    assert "\n  " in d["rendered"]
    d2 = extract_document("a.html", html, None, params={"return_format": "ujson"})
    assert jsonlib.loads(d2["rendered"]) == parsed
