"""ArticleReader's TEI/XML analysis half, as a pure function.

The reference's ArticleReader (article_reader.py:36-80) POSTs a PDF to a
running GROBID service and parses the XML/TEI response into authors /
keywords / sections / bibliography / tables with cross-reference
annotations. The HTTP half is an external service (SURVEY de-scopes
it); THIS module ports the analysis half verbatim, so a user who runs
GROBID themselves can feed its TEI output (``*.tei.xml``) straight into
the engine and get the reference's article structure — the missing
piece between "structure pass-through implemented" and "ArticleReader
done".

Faithfully kept reference behaviors (cited per function):
  - the bibliography cite map records the uid of the line BEFORE each
    bibliography_item (article_reader.py:494-496 assigns
    ``cites[...] = lines[-1].uid`` before appending the item line, and
    then reuses that uid as the new line's metadata uid) — reference
    annotations therefore point at the previous item (or the
    "bibliography" header for the first item);
  - ``__tag2text`` returns "" for tags with mixed content (bs4
    ``.string`` is None unless the tag has exactly one string child);
  - plain-text paragraphs get a trailing newline, mixed-content
    paragraphs do not (article_reader.py:285-289);
  - non-``ref`` child tags inside a paragraph contribute NO text
    (article_reader.py:243-245: ``sub_text = subpart if isinstance(
    subpart, str) else ""``);
  - a missing <abstract> raises (the reference dereferences
    ``soup.find("abstract").p``) — the error lands in the engine's
    typed error channel;
  - the warning string "use GROBID (version: 0.8.0)" is emitted
    verbatim (article_reader.py:80).

De-scoped inside this port: figure image cropping (__parse_images needs
pdf2image + cv2 rasterization of the ORIGINAL pdf — not available, and
the TEI alone has no pixels), so figure refs get no attach annotation.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree as ET

from dedoc_spark.core.model import Annotation, Cell, HierarchyLevel, Line, Table
from dedoc_spark.core.structure import get_dotted_item_depth

# bibliography title level → paragraph type (article_reader.py:481-482,
# "according GROBID description")
_LEVEL2TYPE = {"a": "title", "j": "title_journal", "s": "title_series",
               "m": "title_conference_proceedings"}


def _strip_ns(root: ET.Element) -> None:
    for el in root.iter():
        if "}" in el.tag:
            el.tag = el.tag.split("}", 1)[1]


def _find(el: Optional[ET.Element], tag: str) -> Optional[ET.Element]:
    """First descendant with local name ``tag`` (bs4 attribute access)."""
    if el is None:
        return None
    for sub in el.iter(tag):
        if sub is not el:
            return sub
    return None


def _bs4_string(el: ET.Element) -> Optional[str]:
    """bs4 ``.string``: the tag's text when it has exactly ONE child —
    that child's string directly, or RECURSIVELY when the only child is
    itself a tag (documented bs4 semantics; whitespace text nodes count
    as children, so pretty-printed mixed content still yields None)."""
    kids: List = []
    if el.text:
        kids.append(el.text)
    for child in el:
        kids.append(child)
        if child.tail:
            kids.append(child.tail)
    if len(kids) != 1:
        return None
    kid = kids[0]
    if isinstance(kid, str):
        return kid
    return _bs4_string(kid)


def _tag2text(el: Optional[ET.Element]) -> str:
    """__tag2text (article_reader.py:306-308): "" when ``.string`` is
    None."""
    if el is None:
        return ""
    s = _bs4_string(el)
    return s if s is not None else ""


def _strings_within(el: ET.Element) -> List[str]:
    """All strings inside ``el`` in document order (el.text, then each
    child's subtree strings followed by its tail) — bs4's NavigableString
    iteration order."""
    parts: List[str] = []
    if el.text:
        parts.append(el.text)
    for child in el:
        parts.extend(_strings_within(child))
        if child.tail:
            parts.append(child.tail)
    return parts


def _get_text(el: ET.Element, separator: str = "") -> str:
    """bs4 get_text(separator=...) AFTER __remove_newlines
    (article_reader.py:539-542) extracted the DIRECT bare strings: el.text
    and direct children's tails are dropped, but every string nested
    deeper — including tails of non-direct descendants, e.g. the "tail"
    in <persName>A<hi>b</hi>tail</persName> — is kept in document
    order."""
    parts = [t for child in el for t in _strings_within(child)]
    # (a direct child's own tail is NOT in _strings_within(child), matching
    # the reference's removal of direct NavigableStrings)
    return separator.join(parts)


class _Builder:
    def __init__(self, url_hash: str) -> None:
        self.url_hash = url_hash
        self.n = 0

    def line(
        self,
        text: str,
        level_id: Optional[int] = None,
        ptype: Optional[str] = None,
        annotations: Optional[List[Annotation]] = None,
        uid: Optional[str] = None,
    ) -> Line:
        """__create_line (article_reader.py:134-152): raw_text unless BOTH
        level id and paragraph type are given; None text asserts exactly
        like the reference (broken TEI → typed error channel)."""
        assert text is not None
        if level_id is None or ptype is None:
            hl = HierarchyLevel.create_raw_text()
        else:
            hl = HierarchyLevel(level_id, 0, False, ptype)
        if uid is None:
            uid = (
                f"{self.url_hash}_"
                + hashlib.md5(f"tei{self.n}:{text}".encode()).hexdigest()
            )
        self.n += 1
        return Line(line=text, page_id=0, tag_hl=hl, annotations=annotations or [], uid=uid)


def _parse_author(b: _Builder, author: ET.Element) -> List[Line]:
    """article_reader.py:167-209."""
    lines = [b.line("", 1, "author")]
    pers = _find(author, "persName")
    first = _tag2text(_find(pers, "forename")) if pers is not None else ""
    if first:
        lines.append(b.line(first, 2, "author_first_name"))
    surname = _tag2text(_find(pers, "surname")) if pers is not None else ""
    if surname:
        lines.append(b.line(surname, 2, "author_surname"))
    for email in author.iter("email"):
        lines.append(b.line("".join(email.itertext()), 3, "email"))
    for aff in author.iter("affiliation"):
        lines.append(b.line(aff.get("key"), 2, "author_affiliation"))
        org = _find(aff, "orgName")
        if org is not None:
            lines.append(b.line(_tag2text(org), 3, "org_name"))
        addr = _find(aff, "address")
        if addr is not None:
            lines.append(b.line(_get_text(addr, ", "), 3, "address"))
    return lines


def _content_items(p: ET.Element) -> List:
    """bs4 ``.contents`` for a paragraph: interleaved strings and child
    elements (ET text/tails)."""
    items: List = []
    if p.text:
        items.append(p.text)
    for child in p:
        items.append(child)
        if child.tail:
            items.append(child.tail)
    return items


def _line_with_refs(
    b: _Builder, content, bib2uid: Dict[str, str], table2uid: Dict[str, str]
) -> Line:
    """__create_line_with_refs (article_reader.py:227-252): refs become
    reference/table annotations; other child tags contribute no text."""
    if isinstance(content, str):
        content = [content]
    text = ""
    start = 0
    annotations: List[Annotation] = []
    for subpart in content:
        if isinstance(subpart, ET.Element) and subpart.tag == "ref":
            target = subpart.get("target")
            sub_text = _tag2text(subpart)
            if subpart.get("type") == "bibr" and target in bib2uid:
                annotations.append(
                    Annotation(start, start + len(sub_text), "reference", bib2uid[target])
                )
            if subpart.get("type") == "table" and target in table2uid:
                annotations.append(
                    Annotation(start, start + len(sub_text), "table", table2uid[target])
                )
            # type == "figure": attach annotations need the de-scoped
            # image-crop half — no annotation (module docstring)
        else:
            sub_text = subpart if isinstance(subpart, str) else ""
        text += sub_text
        start += len(sub_text)
    return b.line(text, None, None, annotations)


def _parse_section(
    b: _Builder, div: ET.Element, bib2uid: Dict[str, str], table2uid: Dict[str, str]
) -> List[Line]:
    """__parse_section (article_reader.py:272-290)."""
    lines: List[Line] = []
    head = _find(div, "head")
    number = (head.get("n") if head is not None else None) or ""
    number = number + " " if number else ""
    depth = get_dotted_item_depth(number)
    depth = depth if depth > 0 else 1
    head_text = _tag2text(head) if head is not None else None
    if head_text:
        lines.append(b.line(number + head_text, depth, "section"))
    for p in div.iter("p"):
        # article_reader.py:285-289: the ``.string`` branch (single child,
        # possibly a lone tag — bs4 recurses) gets a trailing newline and
        # NO ref annotations; only true mixed content walks the ref path
        p_string = _bs4_string(p)
        if p_string is not None:
            lines.append(_line_with_refs(b, p_string + "\n", bib2uid, table2uid))
        else:
            items = _content_items(p)
            if items:
                lines.append(_line_with_refs(b, items, bib2uid, table2uid))
    return lines


def _parse_bibliography(b: _Builder, root: ET.Element) -> Tuple[List[Line], Dict[str, str]]:
    """__parse_bibliography (article_reader.py:483-535) — incl. the
    previous-line uid quirk (module docstring)."""
    lines = [b.line("bibliography", 1, "bibliography")]
    cites: Dict[str, str] = {}
    bibl = _find(root, "listBibl")
    if bibl is None:
        return lines, cites
    items = list(bibl.iter("biblStruct"))
    if not items:
        return lines, cites
    for item in items:
        # reference quirk kept verbatim: the cite target AND the new
        # item line's uid are the PREVIOUS line's uid
        cites["#" + (item.get("{http://www.w3.org/XML/1998/namespace}id") or item.get("id") or "")] = lines[-1].uid
        lines.append(b.line("", 2, "bibliography_item", uid=lines[-1].uid))
        for title in item.iter("title"):
            if title.get("level"):
                lines.append(b.line(_tag2text(title), 3, _LEVEL2TYPE[title.get("level")]))
        for author in item.iter("author"):
            lines.append(b.line(_get_text(author, " "), 3, "author"))
        for scope in item.iter("biblScope"):
            if scope.get("unit") == "volume":
                lines.append(b.line(_tag2text(scope), 3, "biblScope_volume"))
        for scope in item.iter("biblScope"):
            if scope.get("unit") == "page":
                lines.append(
                    b.line(f"{scope.get('from')}-{scope.get('to')}", 3, "biblScope_page")
                )
        for idno in item.iter("idno"):
            lines.append(b.line(_tag2text(idno), 3, "DOI"))
        publisher = _find(item, "publisher")
        if publisher is not None:
            lines.append(b.line(_tag2text(publisher), 3, "publisher"))
        date = _find(item, "date")
        if date is not None:
            lines.append(b.line(_tag2text(date), 3, "date"))
    return lines, cites


def _parse_tables(b: _Builder, root: ET.Element, url_hash: str) -> Tuple[List[Table], Dict[str, str]]:
    """__parse_tables (article_reader.py:309-347): colspan from "cols",
    invisible clone cells for the spanned columns, title = head+figDesc."""
    tables: List[Table] = []
    table2uid: Dict[str, str] = {}
    for idx, figure in enumerate(root.iter("figure")):
        if figure.get("type") != "table":
            continue
        # contents[0]-if-str semantics (article_reader.py:324): ANY leading
        # text node wins, including pretty-print whitespace — kept verbatim
        head = figure.text if figure.text is not None else _tag2text(_find(figure, "head"))
        title = (head or "") + _tag2text(_find(figure, "figDesc"))
        grid = _find(figure, "table")
        if grid is None:
            continue
        cells: List[List[Cell]] = []
        for row in grid.iter("row"):
            row_cells: List[Cell] = []
            for cell in row.iter("cell"):
                cell_line = b.line(_tag2text(cell))
                colspan = int(cell.get("cols", 1))
                row_cells.append(Cell(lines=[cell_line], colspan=colspan))
                if colspan > 1:
                    row_cells.extend(
                        Cell(lines=[cell_line], invisible=True) for _ in range(colspan - 1)
                    )
            cells.append(row_cells)
        if not cells:
            continue
        uid = hashlib.md5(f"{url_hash}_teitable_{idx}".encode()).hexdigest()
        tables.append(Table(cells, page_id=0, uid=uid, title=title))
        xml_id = figure.get("{http://www.w3.org/XML/1998/namespace}id") or figure.get("id") or ""
        table2uid[f"#{xml_id}"] = uid
    return tables, table2uid


def extract_tei_lines_tables(
    payload: bytes, url_hash: str = "", with_attachments: bool = False
) -> Tuple[List[Line], List[Table], List[str]]:
    """The read() analysis sequence (article_reader.py:64-80): title →
    first-biblStruct authors → keywords → bibliography → tables →
    abstract+body text with cross-ref annotations → bibliography lines
    appended last.

    ``with_attachments`` mirrors __parse_images (article_reader.py:349-
    399): the reference crops each untyped <figure> out of the source PDF
    (cv2 rasterization — de-scoped here, no pixel source exists on the
    TEI-response path), so instead of SILENTLY skipping, each such figure
    emits a typed warning row naming its xml:id — the attachment channel
    keeps a consistent, observable shape."""
    root = ET.fromstring(payload)
    _strip_ns(root)
    b = _Builder(url_hash)

    lines = [b.line(_tag2text(_find(root, "title")), 0, "root")]
    first_bibl = _find(root, "biblStruct")
    if first_bibl is not None:
        for author in first_bibl.iter("author"):
            lines += _parse_author(b, author)
    keywords = _find(root, "keywords")
    if keywords is not None:
        lines.append(b.line("", 1, "keywords"))
        for term in keywords.iter("term"):
            lines.append(b.line("".join(term.itertext()), 2, "keyword"))

    bib_lines, bib2uid = _parse_bibliography(b, root)
    tables, table2uid = _parse_tables(b, root, url_hash)

    # __parse_text (article_reader.py:254-270): a missing abstract raises,
    # exactly like the reference's soup.find("abstract").p dereference
    abstract = _find(root, "abstract")
    if abstract is None:
        raise ValueError("TEI document has no <abstract>")
    lines.append(b.line("Abstract", 1, "abstract"))
    lines.append(b.line(_tag2text(_find(abstract, "p"))))
    body = _find(root, "body")
    if body is not None:
        # soup.body.find_all("div") (article_reader.py:263) does NOT skip
        # acknowledgement/annex divs — one placed inside <body> is parsed
        # here AND again in the typed loop below, and we reproduce that
        # duplication (real GROBID output puts them in <back>)
        for div in body.iter("div"):
            lines += _parse_section(b, div, bib2uid, table2uid)
    for other in ("acknowledgement", "annex"):
        for outer in root.iter("div"):
            if outer.get("type") == other:
                for div in outer.iter("div"):
                    if div is not outer:
                        lines += _parse_section(b, div, bib2uid, table2uid)
    lines.extend(bib_lines)
    warnings = ["use GROBID (version: 0.8.0)"]
    if with_attachments:
        # soup.find_all("figure", {"type": None}) — table figures carry
        # type="table" and are handled by _parse_tables above
        for fig in root.iter("figure"):
            if fig.get("type") is None:
                fig_id = (
                    fig.get("{http://www.w3.org/XML/1998/namespace}id")
                    or fig.get("id")
                    or "?"
                )
                warnings.append(
                    f"attachment skipped (figure {fig_id}): image cropping "
                    "needs the source PDF pixels (rasterization de-scoped)"
                )
    return lines, tables, warnings


# the ROOT element must be <TEI ...> (after an optional xml declaration /
# doctype) — a mere "tei-c.org" mention inside an html page must NOT
# reroute it, so no content-substring sniff
_TEI_SNIFF = re.compile(
    rb"^\s*(?:<\?xml[^>]*\?>\s*)?(?:<!DOCTYPE[^>]*>\s*)?<TEI[\s>]"
)


def looks_like_tei(url: str, payload: bytes) -> bool:
    low = url.lower()
    if low.endswith((".tei", ".tei.xml")):
        return True
    return bool(_TEI_SNIFF.match(payload[:2048]))
