"""ArticleReader TEI analysis half (core/tei_extract.py; reference
article_reader.py:64-542). The GROBID HTTP call is de-scoped — these
fixtures are GROBID-shaped TEI responses fed directly."""

import json

from dedoc_spark.core.document import extract_document
from dedoc_spark.core.tei_extract import extract_tei_lines_tables, looks_like_tei

TEI = """<?xml version="1.0" encoding="UTF-8"?>
<TEI xmlns="http://www.tei-c.org/ns/1.0">
 <teiHeader>
  <fileDesc>
   <titleStmt><title level="a" type="main">Leakage-Resilient PRGs</title></titleStmt>
   <sourceDesc><biblStruct>
    <analytic>
     <author>
      <persName><forename type="first">Sonia</forename><surname>Belaïd</surname></persName>
      <email>sonia@ens.fr</email>
      <affiliation key="aff0">
       <orgName type="institution">École Normale Supérieure</orgName>
       <address><addrLine>45 rue dUlm</addrLine><postCode>75005</postCode><settlement>Paris</settlement></address>
      </affiliation>
     </author>
    </analytic>
   </biblStruct></sourceDesc>
  </fileDesc>
  <profileDesc>
   <textClass><keywords>
    <term>Multi-Object Tracking</term>
    <term>Survey</term>
   </keywords></textClass>
   <abstract><p>We study leakage.</p></abstract>
  </profileDesc>
 </teiHeader>
 <text>
  <body>
   <div><head n="4.1.1">Preprocessing</head><p>Plain paragraph.</p>
    <p>See <ref type="bibr" target="#b0">[1]</ref> and <ref type="table" target="#tab_0">1</ref>.</p></div>
   <figure type="table" xml:id="tab_0">
    <head>Table 1 .</head><label>1</label>
    <figDesc>Performance of AES implementations.</figDesc>
    <table>
     <row><cell>impl</cell><cell cols="2">cost</cell></row>
     <row><cell>Unprotected</cell><cell>1659</cell><cell>4557</cell></row>
    </table>
   </figure>
  </body>
  <back>
   <div type="annex"><div><head>Appendix</head><p>Annex text.</p></div></div>
   <div type="references"><listBibl>
    <biblStruct xml:id="b0">
     <analytic>
      <title level="a" type="main">Re-keying</title>
      <author><persName><forename type="first">Michel</forename><surname>Abdalla</surname></persName></author>
     </analytic>
     <monogr>
      <title level="m">Bertoni and Coron</title>
      <imprint>
       <biblScope unit="volume">4</biblScope>
       <biblScope unit="page" from="471" to="488" />
       <date type="published" when="2015">2015</date>
      </imprint>
     </monogr>
    </biblStruct>
   </listBibl></div>
  </back>
 </text>
</TEI>
"""


def _types(lines):
    return [(ln.tag_hl.line_type, ln.line) for ln in lines]


def test_tei_full_structure():
    lines, tables, warnings = extract_tei_lines_tables(TEI.encode(), "h")
    t = _types(lines)
    assert t[0] == ("root", "Leakage-Resilient PRGs")
    assert ("author_first_name", "Sonia") in t
    assert ("author_surname", "Belaïd") in t
    assert ("email", "sonia@ens.fr") in t
    assert ("author_affiliation", "aff0") in t
    assert ("org_name", "École Normale Supérieure") in t
    assert ("address", "45 rue dUlm, 75005, Paris") in t
    assert ("keyword", "Multi-Object Tracking") in t
    assert ("abstract", "Abstract") in t
    assert ("raw_text", "We study leakage.") in t
    # section head gets the dotted number prefix and depth from it
    sec = next(ln for ln in lines if ln.tag_hl.line_type == "section")
    assert sec.line == "4.1.1 Preprocessing"
    assert sec.tag_hl.level_1 == 3
    # plain-text paragraph keeps the reference's trailing newline;
    # the mixed-content one does not
    assert ("raw_text", "Plain paragraph.\n") in t
    assert ("raw_text", "See [1] and 1.") in t
    # annex section parsed after body
    assert ("section", "Appendix") in t
    # bibliography family
    assert ("bibliography", "bibliography") in t
    assert ("title", "Re-keying") in t
    assert ("title_conference_proceedings", "Bertoni and Coron") in t
    assert ("author", "Michel Abdalla") in t
    assert ("biblScope_volume", "4") in t
    assert ("biblScope_page", "471-488") in t
    assert ("date", "2015") in t
    assert warnings == ["use GROBID (version: 0.8.0)"]

    # table: title = contents[0]-if-str + figDesc — for pretty-printed
    # TEI the leading WHITESPACE text node wins over <head>, exactly the
    # reference quirk (article_reader.py:324); colspan expands an
    # invisible clone
    assert len(tables) == 1
    tab = tables[0]
    assert tab.title == "\n    Performance of AES implementations."
    assert [c.get_text() for c in tab.cells[0]] == ["impl", "cost", "cost"]
    assert [c.invisible for c in tab.cells[0]] == [False, False, True]
    assert [c.colspan for c in tab.cells[0]] == [1, 2, 1]


def test_tei_ref_annotations_and_cite_quirk():
    lines, tables, _ = extract_tei_lines_tables(TEI.encode(), "h")
    ref_line = next(ln for ln in lines if ln.line == "See [1] and 1.")
    anns = {a.name: a for a in ref_line.annotations}
    assert anns["reference"].start == 4 and anns["reference"].end == 7
    assert anns["table"].value == tables[0].uid
    # reference quirk (article_reader.py:494-496): the cite target is the
    # uid of the line BEFORE the bibliography_item — the header here
    header = next(ln for ln in lines if ln.tag_hl.line_type == "bibliography")
    assert anns["reference"].value == header.uid
    item = next(ln for ln in lines if ln.tag_hl.line_type == "bibliography_item")
    assert item.uid == header.uid  # shared-uid quirk kept verbatim


def test_tei_routes_through_extract_document():
    d = extract_document("paper.tei.xml", TEI.encode(), None)
    assert d["error"] is None
    assert d["n_tables"] == 1
    assert "Leakage-Resilient PRGs" in d["text_extracted"]
    assert "471-488" in d["text_extracted"]
    # article pass-through: reader tags become the hierarchy (no regexp
    # postprocess), so the section line keeps line_type "section"
    nodes = json.loads(d["lines_json"])
    assert any((n.get("hl") or {}).get("line_type") == "section" for n in nodes)
    # without the dedicated extension, routing needs the article opt-in
    # (reference: ArticleReader only engages when document_type=article)
    d2 = extract_document(
        "response.xml", TEI.encode(), None, params={"document_type": "article"}
    )
    assert d2["error"] is None and d2["n_tables"] == 1
    # a <TEI> payload under another url WITHOUT the opt-in keeps its
    # previous reader (default bytes stable)
    d3 = extract_document("response.xml", TEI.encode(), None)
    assert d3["n_tables"] != 1 or d3["text_linear"] != d2["text_linear"]


def test_tei_missing_abstract_is_typed_error():
    broken = "<TEI xmlns=\"http://www.tei-c.org/ns/1.0\"><text><body/></text></TEI>"
    d = extract_document("x.tei.xml", broken.encode(), None)
    assert d["error"] is not None


def test_html_mentioning_tei_not_rerouted():
    html = b"<html><body><p>About tei-c.org and <b>TEI</b> XML</p></body></html>"
    assert not looks_like_tei("page.html", html)
    d = extract_document("page.html", html, None)
    assert d["error"] is None
    assert "About tei-c.org" in d["text_extracted"]


def test_tei_compact_table_title_uses_head():
    """Without a leading text node (compact XML) the title falls back to
    <head> text + figDesc (article_reader.py:324 else-branch)."""
    tei = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><profileDesc>'
        "<abstract><p>a</p></abstract></profileDesc></teiHeader><text><body>"
        '<figure type="table" xml:id="t0"><head>Table 9 .</head>'
        "<figDesc>desc.</figDesc><table><row><cell>x</cell><cell>y</cell></row>"
        "</table></figure></body></text></TEI>"
    )
    _, tables, _ = extract_tei_lines_tables(tei.encode(), "h")
    assert tables[0].title == "Table 9 .desc."


def test_tei_bs4_string_recurses_single_tag_child():
    """bs4 .string recurses through a lone element child: <p><s>text</s></p>
    emits 'text\n' through the plain branch (no annotations), matching
    the reference — and a lone-ref paragraph loses its annotation the
    same way the reference does (the .string branch passes a bare str)."""
    tei = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><profileDesc>'
        "<abstract><p>a</p></abstract></profileDesc></teiHeader><text><body>"
        "<div><head>S</head><p><s>One sentence.</s></p>"
        '<p><ref type="bibr" target="#b0">[1]</ref></p></div>'
        '</body><back><div type="references"><listBibl>'
        '<biblStruct xml:id="b0"/></listBibl></div></back></text></TEI>'
    )
    lines, _, _ = extract_tei_lines_tables(tei.encode(), "h")
    texts = [ln.line for ln in lines]
    assert "One sentence.\n" in texts
    ref_line = next(ln for ln in lines if ln.line == "[1]\n")
    assert ref_line.annotations == []  # reference quirk: .string branch


def test_tei_get_text_keeps_nested_tails():
    """bs4 get_text after __remove_newlines (article_reader.py:538-542):
    DIRECT bare strings under the tag are extracted, but strings nested
    deeper — including tails of non-direct descendants like the 'tail' in
    <persName>A<hi>b</hi>tail</persName> — survive, in document order."""
    tei = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><profileDesc>'
        "<abstract><p>a</p></abstract></profileDesc></teiHeader>"
        '<text><body/><back><div type="references"><listBibl>'
        '<biblStruct xml:id="b0"><analytic><author>\n'
        "<persName>A<hi>b</hi>tail</persName>\n"
        "</author></analytic></biblStruct>"
        "</listBibl></div></back></text></TEI>"
    )
    lines, _, _ = extract_tei_lines_tables(tei.encode(), "h")
    author = next(
        ln for ln in lines if ln.tag_hl.line_type == "author" and ln.line
    )
    # separator " " joins the three NavigableStrings inside persName;
    # the newlines directly under <author> were removed
    assert author.line == "A b tail"


def test_tei_acknowledgement_in_body_parsed_twice():
    """soup.body.find_all('div') (article_reader.py:263) does NOT skip
    acknowledgement divs: one placed inside <body> is parsed by the body
    loop AND by the typed loop — the duplication is reproduced, with the
    body-loop occurrences first."""
    tei = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><profileDesc>'
        "<abstract><p>a</p></abstract></profileDesc></teiHeader><text><body>"
        "<div><head>S</head><p>Body text.</p></div>"
        '<div type="acknowledgement"><div><head>Ack</head><p>Thanks.</p></div></div>'
        "</body></text></TEI>"
    )
    lines, _, _ = extract_tei_lines_tables(tei.encode(), "h")
    texts = [ln.line for ln in lines]
    # THREE times, exactly like bs4: body.find_all("div") is recursive so
    # it parses the outer acknowledgement div (whose .head/.find_all("p")
    # reach the nested content) AND the inner div; the typed loop then
    # parses the inner div once more
    assert texts.count("Thanks.\n") == 3
    assert texts.count("Body text.\n") == 1


def test_tei_figure_attachment_warning_row():
    """with_attachments (article_reader.py:349-399): the reference crops
    untyped <figure>s out of the source PDF — no pixels exist on the
    TEI-response path, so each such figure emits a TYPED warning naming
    its xml:id instead of being silently skipped; table figures and the
    default (param off) are unaffected."""
    tei = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><profileDesc>'
        "<abstract><p>a</p></abstract></profileDesc></teiHeader><text><body>"
        '<figure xml:id="fig_0"><head>Fig. 1 .</head>'
        '<graphic coords="3,1,1,2,2" type="bitmap"/></figure>'
        '<figure type="table" xml:id="tab_0"><head>Table 1 .</head>'
        "<table><row><cell>x</cell></row></table></figure>"
        "</body></text></TEI>"
    ).encode()
    _, _, warnings = extract_tei_lines_tables(tei, "h", with_attachments=True)
    fig_warnings = [w for w in warnings if w.startswith("attachment skipped")]
    assert fig_warnings == [
        "attachment skipped (figure fig_0): image cropping needs the "
        "source PDF pixels (rasterization de-scoped)"
    ]
    # default: byte-identical warnings (just the GROBID banner)
    _, _, default_w = extract_tei_lines_tables(tei, "h")
    assert default_w == ["use GROBID (version: 0.8.0)"]
    # end-to-end: the param flows through extract_document
    d = extract_document(
        "a.tei", tei, None, params={"with_attachments": "true"}
    )
    assert any(w.startswith("attachment skipped (figure fig_0)") for w in d["warnings"])
