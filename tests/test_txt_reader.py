"""Ports of the reference txt-reader unit tests
(tests/unit_tests/test_format_txt_reader.py shape): uid determinism,
spacing/indent annotation values, paragraph flags, NFC normalization."""

import hashlib

from dedoc_spark.core.document import extract_txt_document
from dedoc_spark.core.txt_extract import extract_txt_lines


def test_uid_scheme_and_determinism():
    text = "first line\nsecond line\n"
    lines = extract_txt_lines(text)
    h = hashlib.md5(text.encode()).hexdigest()
    assert [ln.uid for ln in lines] == [f"txt_{h}_0", f"txt_{h}_1"]
    again = extract_txt_lines(text)
    assert [ln.uid for ln in again] == [ln.uid for ln in lines]


def test_spacing_annotation_counts_empty_lines():
    text = "a\n\n\nb\nc\n"
    lines = extract_txt_lines(text)
    spacing = {
        ln.line_id: next(a.value for a in ln.annotations if a.name == "spacing")
        for ln in lines
    }
    # first line: no empty predecessors → 100*0.5 = 50
    assert spacing[0] == "50"
    # "b" follows two empty lines → 200
    assert spacing[3] == "200"
    # "c" directly follows non-empty → 50
    assert spacing[4] == "50"


def test_indent_annotation_tab_counts_three():
    lines = extract_txt_lines("\tindented\n    spaced\nplain\n")
    indents = [next(a.value for a in ln.annotations if a.name == "indentation") for ln in lines]
    assert indents == [str(211 * 3), str(211 * 4), "0"]


def test_paragraph_flag_on_indent_jump():
    # tab expands to 4 in the paragraph check (raw_text_reader.py:105)
    text = "zero\n  two spaces\n    four spaces\n"
    lines = extract_txt_lines(text)
    flags = [ln.tag_hl.can_be_multiline for ln in lines]
    # jump 0→2 ≥ 2 → paragraph; 2→4 ≥ 2 → paragraph
    assert flags == [True, False, False]


def test_nfc_and_i_kratkoe_recomposition():
    decomposed = "йод"  # й written as и + combining breve
    lines = extract_txt_lines(decomposed + "\n")
    assert lines[0].line == "йод\n"


def test_full_txt_pipeline_structure():
    text = "Title here\n1. first item\n2. second item\nplain tail\n"
    doc = extract_txt_document("https://t.example/txt", text)
    assert doc["error"] is None
    import json

    lines = json.loads(doc["lines_json"])
    assert lines[1]["hl"]["line_type"] == "list_item"
    assert lines[1]["hl"]["level_1"] == 2 and lines[1]["hl"]["level_2"] == 1
    assert lines[3]["hl"]["line_type"] == "raw_text"


def test_bracket_letter_bullet_patterns():
    # note: the reference roman regexp matches a single roman char only
    # (roman_prefix.py:18) — "iv." would NOT match
    text = "1) bracket\nа) letter\n- bullet\nv. roman\n"
    doc = extract_txt_document("https://t.example/pat", text)
    import json

    lines = json.loads(doc["lines_json"])
    levels = [(ln["hl"]["level_1"], ln["hl"]["line_type"]) for ln in lines]
    assert levels[0] == (4, "list_item")  # bracket
    assert levels[1] == (5, "list_item")  # letter
    assert levels[2] == (6, "list_item")  # bullet
    assert levels[3] == (3, "list_item")  # roman


def test_xml_routes_as_raw_text():
    """.xml is txt_like in the reference (extensions.py:35): RawTextReader
    lines with trailing newlines kept — the reference's own
    test_api_format_xml assertions."""
    import json

    from dedoc_spark.core.document import extract_document

    payload = b'<?xml version="1.0" encoding="UTF-8"?>\n<note>\n  <to>Tove</to>\n</note>'
    d = extract_document("simple.xml", payload, None, params={})
    assert d.get("error") is None
    lines = [ln["line"] for ln in json.loads(d["lines_json"])]
    assert lines == [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        "<note>\n",
        "  <to>Tove</to>\n",
        "</note>",
    ]
