"""XLSX and PPTX reader tests (excel_reader / pptx_reader semantics over
programmatically generated fixtures)."""

import json

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.office_extract import extract_pptx, extract_xlsx_tables
from dedoc_spark.sources.office_fixture import build_pptx, build_xlsx


def test_xlsx_one_table_per_sheet():
    payload = build_xlsx(
        [
            [["name", "qty"], ["apple", "3"]],
            [["only sheet two"]],
        ]
    )
    tables, _ = extract_xlsx_tables(payload)
    assert len(tables) == 2
    assert [[c.get_text() for c in row] for row in tables[0].cells] == [
        ["name", "qty"],
        ["apple", "3"],
    ]
    assert tables[0].page_id == 0 and tables[1].page_id == 1
    assert tables[1].cells[0][0].get_text() == "only sheet two"


def test_xlsx_rectangular_padding():
    payload = build_xlsx([[["a", "b", "c"], ["d"]]])
    tables, _ = extract_xlsx_tables(payload)
    assert [[c.get_text() for c in row] for row in tables[0].cells] == [
        ["a", "b", "c"],
        ["d", "", ""],
    ]


def test_pptx_slides_and_title():
    payload = build_pptx(
        [
            {"shapes": [["Slide One Title"], ["bullet a", "bullet b"]]},
            {"shapes": [["Second Slide"]], "table": [["h1", "h2"], ["v1", "v2"]]},
        ]
    )
    lines, tables, _ = extract_pptx(payload)
    assert [ln.line for ln in lines] == ["Slide One Title", "bullet a", "bullet b", "Second Slide"]
    # first shape of each slide gets the title/header tag
    assert lines[0].tag_hl.line_type == "header"
    assert lines[1].tag_hl.is_unknown()
    assert lines[3].tag_hl.line_type == "header"
    assert [ln.page_id for ln in lines] == [0, 0, 0, 1]
    assert len(tables) == 1
    assert [[c.get_text() for c in row] for row in tables[0].cells] == [["h1", "h2"], ["v1", "v2"]]


def test_dispatch_xlsx_pptx():
    d = extract_document("https://x/book", build_xlsx([[["z"]]]), None)
    assert d["error"] is None and d["n_tables"] == 1
    d2 = extract_document("https://x/deck", build_pptx([{"shapes": [["T"]]}]), None)
    assert d2["error"] is None
    tree = json.loads(d2["tree_json"])
    assert tree["subparagraphs"][0]["text"] == "T"
    assert tree["subparagraphs"][0]["metadata"]["paragraph_type"] == "header"


def test_pptx_picture_and_table_annotations():
    """p:pic → attachment annotation and a:tbl → table annotation, both on
    the preceding line (pptx_reader.py:62-68,100-108), uid joined through
    the slide rels."""
    from dedoc_spark.core.docx_extract import attachment_uid
    from dedoc_spark.core.office_extract import extract_pptx
    from dedoc_spark.sources.office_fixture import build_pptx

    pptx = build_pptx(
        [{"shapes": [["Title here"], ["body line"]],
          "table": [["a", "b"]],
          "picture": "image1.png"}]
    )
    lines, tables, _ = extract_pptx(pptx, url_hash="h9")
    assert len(tables) == 1
    last = lines[-1]
    names = [(a.name, a.value) for a in last.annotations]
    assert ("table", tables[0].uid) in names
    assert ("attachment", attachment_uid("h9", "image1.png")) in names


def test_pptx_picture_only_slide_synthesizes_anchor():
    from dedoc_spark.core.office_extract import extract_pptx
    from dedoc_spark.sources.office_fixture import build_pptx

    lines, _, _ = extract_pptx(build_pptx([{"shapes": [], "picture": "p.png"}]), "h")
    assert len(lines) == 1 and lines[0].line == ""
    assert any(a.name == "attachment" for a in lines[0].annotations)


def test_pptx_bullets_and_numbering():
    """a:buAutoNum renders the sequence text with the reference's scheme
    quirks (alpha wraps aa/bb, per-shape counters, deeper level restarts);
    a:buChar prefixes the char (pptx paragraph.py:25-46, shape.py:34-45)."""
    from dedoc_spark.core.office_extract import extract_pptx
    from dedoc_spark.sources.office_fixture import build_pptx

    pptx = build_pptx([
        {"shapes": [
            ["The Title"],
            [("first", "auto:arabicPeriod"), ("second", "auto:arabicPeriod"),
             ("sub one", "auto:alphaLcParenR:lvl1"), ("third", "auto:arabicPeriod"),
             ("starred", "char:•")],
        ]}
    ])
    lines, _, _ = extract_pptx(pptx, "h")
    texts = [(ln.line, ln.tag_hl.line_type if ln.tag_hl else None,
              (ln.tag_hl.level_1, ln.tag_hl.level_2) if ln.tag_hl else None) for ln in lines]
    assert texts[0] == ("The Title", "header", (1, 1))
    assert texts[1] == ("1. first", "list_item", (2, 1))
    assert texts[2] == ("2. second", "list_item", (2, 1))
    assert texts[3] == ("a) sub one", "list_item", (2, 2))
    assert texts[4] == ("3. third", "list_item", (2, 1))
    assert texts[5] == ("• starred", "list_item", (3, 1))
