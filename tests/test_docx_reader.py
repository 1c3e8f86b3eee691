"""DOCX reader tests (ports of tests/unit_tests/test_format_docx_reader.py
shapes, over programmatically generated OOXML fixtures)."""

import json

from dedoc_spark.core.docx_extract import extract_docx
from dedoc_spark.core.document import extract_document
from dedoc_spark.sources.docx_fixture import build_docx, example_docx, paragraph, table


def test_headings_and_text():
    lines, tables, _ = extract_docx(example_docx())
    texts = [ln.line for ln in lines]
    assert texts[0] == "Пример документа"
    assert lines[0].tag_hl.line_type == "header"
    assert (lines[0].tag_hl.level_1, lines[0].tag_hl.level_2) == (1, 1)
    assert lines[1].line == "Глава 1"
    assert (lines[1].tag_hl.level_1, lines[1].tag_hl.level_2) == (1, 2)
    assert lines[2].tag_hl.is_unknown()


def test_run_annotations_offsets():
    lines, _, _ = extract_docx(example_docx())
    line = lines[2]  # "Какие то определения" with bold second run
    bold = [a for a in line.annotations if a.name == "bold"]
    assert len(bold) == 1
    assert line.line[bold[0].start : bold[0].end] == "определения"
    styled = lines[4]  # bold + italic runs
    bold = next(a for a in styled.annotations if a.name == "bold")
    ital = next(a for a in styled.annotations if a.name == "italic")
    assert styled.line[bold.start : bold.end] == "Определим "
    assert styled.line[ital.start : ital.end] == "понятия"


def test_heading_style_size_annotation():
    lines, _, _ = extract_docx(example_docx())
    sizes = {a.value for a in lines[0].annotations if a.name == "size"}
    assert "16.0" in sizes  # Heading1 sz=32 half-points → 16 pt


def test_numbering_rendering():
    lines, _, _ = extract_docx(example_docx())
    texts = [ln.line for ln in lines]
    assert texts[5] == "1. Поясним за непонятное"
    assert texts[6] == "1.1. Поясним за понятное"
    assert texts[7] == "1.2. снова непонятное"
    assert texts[8] == "a) подпункт"
    assert texts[9] == "•маркер"
    # list tag levels: ilvl+1
    assert (lines[5].tag_hl.level_1, lines[5].tag_hl.level_2) == (2, 1)
    assert (lines[6].tag_hl.level_1, lines[6].tag_hl.level_2) == (2, 2)
    assert lines[5].tag_hl.line_type == "list_item"


def test_based_on_style_inheritance():
    body = paragraph([("quoted text", "")], style="Quote")
    lines, _, _ = extract_docx(build_docx(body))
    names = {(a.name, a.value) for a in lines[0].annotations}
    # Quote basedOn Heading2: inherits bold+sz28, adds italic
    assert ("bold", "True") in names
    assert ("italic", "True") in names
    assert ("size", "14.0") in names
    assert ("style", "Quote") in names


def test_spacing_max_of_prev_after_and_cur_before():
    body = paragraph([("a", "")], spacing=(0, 200)) + paragraph([("b", "")], spacing=(100, 0))
    lines, _, _ = extract_docx(build_docx(body))
    spacing_b = next(a for a in lines[1].annotations if a.name == "spacing")
    assert spacing_b.value == "200"  # max(prev after=200, cur before=100)


def test_alignment_and_indent():
    body = paragraph([("c", "")], jc="center", ind_left=708)
    lines, _, _ = extract_docx(build_docx(body))
    ann = {(a.name, a.value) for a in lines[0].annotations}
    assert ("alignment", "center") in ann
    assert ("indentation", "708") in ann


def test_table_vmerge_gridspan():
    _, tables, _ = extract_docx(example_docx())
    cells = tables[0].cells
    # row 0: A, B(restart, rowspan 2), C
    assert [c.get_text() for c in cells[0]] == ["A", "B", "C"]
    assert cells[0][1].rowspan == 2
    # row 1: D, B-clone(invisible), E
    assert [c.get_text() for c in cells[1]] == ["D", "B", "E"]
    assert cells[1][1].invisible
    # row 2: F spans 2 → F, F-clone(invisible), G
    assert [c.get_text() for c in cells[2]] == ["F", "F", "G"]
    assert cells[2][1].invisible and cells[2][0].colspan == 2


def test_newline_fix_between_raw_lines():
    body = paragraph([("first", "")]) + paragraph([("second", "")])
    lines, _, _ = extract_docx(build_docx(body))
    assert lines[0].line == "first\n"
    assert lines[1].line == "second"


def test_full_pipeline_docx_tree():
    doc = extract_document("https://x/doc.docx", example_docx(), None)
    assert doc["error"] is None
    tree = json.loads(doc["tree_json"])
    # Heading1 → first child of root; Heading2 "Глава 1" nested under it
    h1 = tree["subparagraphs"][0]
    assert h1["text"].startswith("Пример документа")
    assert h1["metadata"]["paragraph_type"] == "header"
    assert h1["subparagraphs"][0]["text"].startswith("Глава 1")
    # numbered items under a synthetic list node
    flat = json.loads(doc["nodes_json"])
    types = {n["paragraph_type"] for n in flat}
    assert "list" in types and "list_item" in types
    assert doc["n_tables"] == 1


def test_table_caption_annotation_join():
    # "Таблица N" caption two-before the table receives the table uid
    # (docx_document.py:121-131)
    body = (
        paragraph([("Таблица 1 — результаты", "")])
        + paragraph([("вводный текст", "")])
        + table([[("x", 1, None)]])
        + paragraph([("другой абзац", "")])
        + table([[("y", 1, None)]])
    )
    lines, tables, _ = extract_docx(build_docx(body))
    ann0 = [(a.name, a.value) for a in lines[0].annotations if a.name == "table"]
    assert ann0 == [("table", tables[0].uid)]
    # second table: no caption two-before → annotation on the line just before
    ann2 = [(a.name, a.value) for a in lines[2].annotations if a.name == "table"]
    assert ann2 == [("table", tables[1].uid)]
    assert not [a for a in lines[1].annotations if a.name == "table"]


def test_full_basedon_chain():
    """QuoteDeep ← Quote ← Heading2: props accumulate root-first
    (styles_extractor.py:90-113), so a 2-deep chain yields bold (Heading2)
    + italic (Quote) + underline (QuoteDeep) on the same run."""
    from dedoc_spark.sources.docx_fixture import build_docx, paragraph

    lines, _, _ = extract_docx(build_docx(paragraph([("chained", "")], style="QuoteDeep")))
    names = {(a.name, a.value) for a in lines[0].annotations}
    assert ("bold", "True") in names
    assert ("italic", "True") in names
    assert ("underlined", "True") in names
    assert ("style", "Quote Deep") in names
    assert ("size", "14.0") in names  # sz 28 from Heading2 via the chain


def test_character_style_rstyle():
    """rStyle applies the character-style chain per run (paragraph.py
    __make_run_list): only the styled run goes italic at sz 24."""
    from dedoc_spark.sources.docx_fixture import build_docx

    body = (
        '<w:p><w:r><w:t xml:space="preserve">plain </w:t></w:r>'
        '<w:r><w:rPr><w:rStyle w:val="Emph"/></w:rPr><w:t>emphasized</w:t></w:r></w:p>'
    )
    lines, _, _ = extract_docx(build_docx(body))
    assert lines[0].line == "plain emphasized"
    ital = [a for a in lines[0].annotations if a.name == "italic"]
    assert len(ital) == 1
    assert (ital[0].start, ital[0].end) == (6, 16)
    sizes = {(a.start, a.end): a.value for a in lines[0].annotations if a.name == "size"}
    assert sizes[(0, 6)] == "10.0" and sizes[(6, 16)] == "12.0"


def test_hyperlink_runs_included():
    """Runs wrapped in w:hyperlink are part of the paragraph text (the
    reference's recursive find_all('w:r'))."""
    from dedoc_spark.sources.docx_fixture import build_docx

    body = (
        '<w:p><w:r><w:t xml:space="preserve">see </w:t></w:r>'
        '<w:hyperlink><w:r><w:rPr><w:u w:val="single"/></w:rPr><w:t>the site</w:t></w:r></w:hyperlink>'
        '<w:r><w:t xml:space="preserve"> now</w:t></w:r></w:p>'
    )
    lines, _, _ = extract_docx(build_docx(body))
    assert lines[0].line == "see the site now"
    under = [a for a in lines[0].annotations if a.name == "underlined"]
    assert len(under) == 1 and (under[0].start, under[0].end) == (4, 12)


def test_footnotes_linked_text():
    """footnoteReference → linked_text annotation over the whole line with
    the note's space-joined text (footnote_extractor.py:17-22)."""
    from dedoc_spark.sources.docx_fixture import build_docx

    body = (
        '<w:p><w:r><w:t>claim one</w:t></w:r>'
        '<w:r><w:footnoteReference w:id="1"/></w:r></w:p>'
        '<w:p><w:r><w:t>claim two</w:t></w:r>'
        '<w:r><w:footnoteReference w:id="2"/></w:r></w:p>'
    )
    lines, _, _ = extract_docx(build_docx(body, with_footnotes=True))
    l1 = [a for a in lines[0].annotations if a.name == "linked_text"]
    l2 = [a for a in lines[1].annotations if a.name == "linked_text"]
    assert [a.value for a in l1] == ["first note text"]
    assert [a.value for a in l2] == ["second note"]
    assert (l1[0].start, l1[0].end) == (0, len(lines[0].line))


def test_caps_and_sym():
    from dedoc_spark.sources.docx_fixture import build_docx

    body = (
        '<w:p><w:r><w:rPr><w:caps/></w:rPr><w:t>shout</w:t></w:r>'
        '<w:r><w:sym w:font="Wingdings" w:char="0041"/></w:r></w:p>'
    )
    lines, _, _ = extract_docx(build_docx(body))
    assert lines[0].line == "SHOUTA"


def test_adjacent_equal_runs_merge():
    """Equal-property adjacent runs merge into one span (run.py:52-59 ==),
    so annotations don't fragment."""
    from dedoc_spark.sources.docx_fixture import build_docx, paragraph

    lines, _, _ = extract_docx(build_docx(paragraph([("one ", "b"), ("two", "b")])))
    bolds = [a for a in lines[0].annotations if a.name == "bold"]
    assert len(bolds) == 1 and (bolds[0].start, bolds[0].end) == (0, 7)


def test_docx_image_attachment_annotation_join():
    """a:blip r:embed → document.xml.rels → media name → attachment
    annotation on the hosting line, uid matching the attachments channel
    (docx_document.py:104-108,133-154)."""
    import io
    import zipfile

    from dedoc_spark.core.docx_extract import attachment_uid
    from dedoc_spark.sources.docx_fixture import CONTENT_TYPES, W_NS

    document = (
        f'<?xml version="1.0"?><w:document {W_NS} '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<w:body>"
        "<w:p><w:r><w:t>figure below</w:t></w:r>"
        '<w:r><w:drawing><a:blip r:embed="rId5"/></w:drawing></w:r></w:p>'
        "<w:p><w:r><w:t>no image here</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId5" Type="image" Target="media/image1.png"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", CONTENT_TYPES)
        zf.writestr("word/document.xml", document)
        zf.writestr("word/_rels/document.xml.rels", rels)
        zf.writestr("word/media/image1.png", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    lines, _, _ = extract_docx(buf.getvalue(), url_hash="h123")
    att = [a for a in lines[0].annotations if a.name == "attachment"]
    assert len(att) == 1
    assert att[0].value == attachment_uid("h123", "image1.png")
    assert (att[0].start, att[0].end) == (0, len(lines[0].line))
    assert not any(a.name == "attachment" for a in lines[1].annotations)


def test_strict_ooxml_namespace_normalized():
    """ISO strict OOXML (purl.oclc.org namespace URIs — the corpus's
    size1.docx) parses identically to transitional: the reference's bs4
    matches prefixes so it never notices the URI change."""
    import re

    payload = build_docx(paragraph([("strict body text", "")]))
    strict = payload.replace(
        b"http://schemas.openxmlformats.org/wordprocessingml/2006/main",
        b"http://purl.oclc.org/ooxml/wordprocessingml/main",
    )
    assert strict != payload  # replacement really happened

    # rebuild the zip with the strict document.xml
    import io
    import zipfile

    src = zipfile.ZipFile(io.BytesIO(payload))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in src.namelist():
            data = src.read(n)
            out.writestr(
                n,
                re.sub(
                    rb"http://schemas\.openxmlformats\.org/wordprocessingml/2006/main",
                    b"http://purl.oclc.org/ooxml/wordprocessingml/main",
                    data,
                ),
            )
    lines_t, _, _ = extract_docx(payload, "h")
    lines_s, _, _ = extract_docx(buf.getvalue(), "h")
    assert [ln.line for ln in lines_s] == [ln.line for ln in lines_t]
    assert "strict body text" in [ln.line for ln in lines_s]


def test_diagram_paragraph_attachments():
    """A VML pict paragraph becomes (a) an attachment annotation on its
    line and (b) a repacked one-diagram docx in the attachments channel
    (docx_attachments_extractor.py __extract_diagrams), with a joinable
    deterministic uid."""
    import io
    import zipfile

    from dedoc_spark.core.docx_extract import attachment_uid, diagram_attachments
    from dedoc_spark.core.formats import list_attachments

    base = build_docx(
        paragraph([("before", "")])
        + '<w:p><w:r><w:pict><v:shape xmlns:v="urn:schemas-microsoft-com:vml"/>'
        "</w:pict></w:r></w:p>"
        + paragraph([("after", "")])
    )
    atts = diagram_attachments(base)
    assert len(atts) == 1
    name, data = atts[0]
    assert name.endswith(".docx")
    assert diagram_attachments(base) == atts  # deterministic bytes
    # the repacked docx parses and contains no body text (diagram only)
    lines, _, _ = extract_docx(data, "h")
    assert all(ln.line.strip() in ("", "before", "after") for ln in lines)
    # list_attachments surfaces it ahead of media members
    assert [n for n, _ in list_attachments("d.docx", base)][0] == name
    # the hosting line carries the joinable annotation
    lines0, _, _ = extract_docx(base, "h")
    ann = [a.value for ln in lines0 for a in ln.annotations if a.name == "attachment"]
    assert ann == [attachment_uid("h", name)]


def test_diagram_index_alignment_with_body_table():
    """Repro of the r6 review finding: a body-level table BEFORE the pict
    paragraph must not shift the diagram index — table-cell w:p elements
    are not body children (reference iterates ``bs.body`` directly,
    docx_document.py:66-76). The annotation lands on the pict paragraph's
    own line, and the repacked docx holds ONLY the diagram element."""
    from dedoc_spark.core.docx_extract import attachment_uid, diagram_attachments

    base = build_docx(
        table([[("cell text", 1, None)]])
        + '<w:p><w:r><w:pict><v:shape xmlns:v="urn:schemas-microsoft-com:vml"/>'
        "</w:pict></w:r></w:p>"
        + paragraph([("after", "")])
    )
    atts = diagram_attachments(base)
    assert len(atts) == 1
    name, data = atts[0]
    lines, _, _ = extract_docx(base, "h")
    by_line = {
        ln.line.strip(): [a.value for a in ln.annotations if a.name == "attachment"]
        for ln in lines
    }
    assert by_line.get("after") == []
    pict_lines = [vals for txt, vals in by_line.items() if txt == ""]
    assert [attachment_uid("h", name)] in pict_lines
    # repacked docx: only the diagram paragraph survives in the body
    rlines, rtables, _ = extract_docx(data, "h")
    assert all(ln.line.strip() == "" for ln in rlines)
    assert rtables == []


def test_diagram_pict_inside_table_cell():
    """Pict inside a body-level table: the WHOLE tbl is the diagram span
    for the attachments channel (the reference's bs.body loop extracts the
    tbl), but the reader treats tbl as a table FIRST (docx_document.py:70)
    so no line gets a diagram annotation and the table still parses."""
    from dedoc_spark.core.docx_extract import diagram_attachments

    pict_cell_tbl = (
        "<w:tbl><w:tr><w:tc><w:p><w:r>"
        '<w:pict><v:shape xmlns:v="urn:schemas-microsoft-com:vml"/></w:pict>'
        "</w:r></w:p></w:tc></w:tr></w:tbl>"
    )
    base = build_docx(pict_cell_tbl + paragraph([("plain", "")]))
    atts = diagram_attachments(base)
    assert len(atts) == 1  # the tbl itself is repacked
    lines, tables, _ = extract_docx(base, "h")
    assert len(tables) == 1  # table wins in the reader
    assert all(
        a.name != "attachment" for ln in lines for a in ln.annotations
    )


def test_strict_ooxml_diagram_uid_agreement():
    """r6 review finding: the reader hashes NORMALIZED document.xml for
    diagram annotation uids while the attachments channel hashed raw
    bytes — on a strict-OOXML docx with an inline purl.oclc.org xmlns
    on the pict paragraph the join key diverged. Both sides now share
    core/ooxml_ns.normalize_strict_ooxml."""
    import io
    import zipfile

    from dedoc_spark.core.docx_extract import attachment_uid, diagram_attachments

    pict_p = (
        '<w:p><w:r><w:pict xmlns:wpd="http://schemas.openxmlformats.org/'
        'drawingml/2006/wordprocessingDrawing">'
        '<v:shape xmlns:v="urn:schemas-microsoft-com:vml"/>'
        "</w:pict></w:r></w:p>"
    )
    payload = build_docx(paragraph([("before", "")]) + pict_p)
    src = zipfile.ZipFile(io.BytesIO(payload))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in src.namelist():
            data = src.read(n)
            data = data.replace(
                b"http://schemas.openxmlformats.org/wordprocessingml/2006/main",
                b"http://purl.oclc.org/ooxml/wordprocessingml/main",
            ).replace(
                b"http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing",
                b"http://purl.oclc.org/ooxml/drawingml/wordprocessingDrawing",
            )
            out.writestr(n, data)
    strict = buf.getvalue()
    atts = diagram_attachments(strict)
    assert len(atts) == 1
    name = atts[0][0]
    lines, _, _ = extract_docx(strict, "h")
    ann = [a.value for ln in lines for a in ln.annotations if a.name == "attachment"]
    assert ann == [attachment_uid("h", name)]
