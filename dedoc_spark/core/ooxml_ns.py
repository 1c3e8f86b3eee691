"""ISO "strict" OOXML namespace normalization, shared by the docx /
xlsx / pptx readers AND the docx attachments channel (r6 review finding:
three diverging copies of this URI map meant diagram uids were hashed
over raw bytes in one place and normalized bytes in another).

ISO strict renames every namespace URI under purl.oclc.org (ECMA-376
part 1 annex; the package-relationships namespace is unchanged between
editions). The reference's bs4 matches on the "w:" PREFIX so it never
notices — we normalize strict URIs to transitional so the ElementTree
paths line up.
"""

from __future__ import annotations

_STRICT_TO_TRANSITIONAL = [
    (
        b"http://purl.oclc.org/ooxml/wordprocessingml/main",
        b"http://schemas.openxmlformats.org/wordprocessingml/2006/main",
    ),
    (
        b"http://purl.oclc.org/ooxml/spreadsheetml/main",
        b"http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    ),
    (
        b"http://purl.oclc.org/ooxml/presentationml/main",
        b"http://schemas.openxmlformats.org/presentationml/2006/main",
    ),
    (
        b"http://purl.oclc.org/ooxml/officeDocument/relationships",
        b"http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    ),
    (
        b"http://purl.oclc.org/ooxml/drawingml/main",
        b"http://schemas.openxmlformats.org/drawingml/2006/main",
    ),
    (
        b"http://purl.oclc.org/ooxml/drawingml/wordprocessingDrawing",
        b"http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing",
    ),
]


def normalize_strict_ooxml(data: bytes) -> bytes:
    """Rewrite ISO-strict namespace URIs to their transitional twins.
    No-op (and no copy) for the overwhelmingly common transitional case."""
    if b"http://purl.oclc.org/ooxml/" not in data:
        return data
    for strict, trans in _STRICT_TO_TRANSITIONAL:
        data = data.replace(strict, trans)
    return data
