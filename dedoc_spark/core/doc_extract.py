"""Legacy binary Word (.doc) and PowerPoint (.ppt) text extraction —
pure Python over the OLE2 walker (core/xls_extract.ole2_streams).

The reference routes these through a soffice→docx conversion
(converters/concrete_converters/docx_converter.py:15-28); soffice is not a
library dependency, so this module extracts the text layer natively:

  .doc  [MS-DOC] piece table: FIB → fcClx/lcbClx → Clx in the 0Table/1Table
        stream → Pcdt/PlcPcd → text pieces (8-bit cp1252-compressed or
        UTF-16LE) concatenated in CP order; paragraph marks (0x0D) split
        lines; field/object control chars are stripped.
  .ppt  [MS-PPT] record scan of the "PowerPoint Document" stream:
        TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8,
        one-byte chars) payloads in stream order, one slide-text per atom.

Both are best-effort (no styles/tables) and tag the output with a warning
naming the native path, since the reference's answer for these formats is
an external converter.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

from dedoc_spark.core.xls_extract import ole2_streams

# chars Word uses as markers inside the text stream
_DOC_STRIP = {
    0x00: "", 0x01: "", 0x02: "", 0x05: "", 0x08: "",
    0x07: "\t",   # cell/row mark → tab keeps table cells apart
    0x0B: "\n",   # hard line break
    0x0C: "\n",   # page break / section mark
    0x0D: "\n",   # paragraph mark
    0x1E: "-", 0x1F: "", 0xA0: " ",
}


def _clean_doc_text(raw: str) -> str:
    out: List[str] = []
    for ch in raw:
        code = ord(ch)
        if code in _DOC_STRIP:
            out.append(_DOC_STRIP[code])
        elif code >= 0x20 or ch in "\t\n":
            out.append(ch)
    return "".join(out)


def extract_doc_text(payload: bytes) -> Tuple[List[str], List[str]]:
    """.doc bytes → (lines, warnings) via the piece table."""
    streams = ole2_streams(payload)
    word = streams.get("WordDocument")
    if word is None or len(word) < 1024:
        raise ValueError("no WordDocument stream")
    if struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise ValueError("not a Word binary file (bad wIdent)")
    flags = struct.unpack_from("<H", word, 0x000A)[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name) or streams.get("0Table") or streams.get("1Table")
    # FIB layout: base(32) + csw(2) + fibRgW(28) + cslw(2) + fibRgLw(88) +
    # cbRgFcLcb(2); fcClx/lcbClx are pair index 33 of fibRgFcLcb97
    fib_rgfclcb = 32 + 2 + 28 + 2 + 88 + 2
    fc_clx = struct.unpack_from("<I", word, fib_rgfclcb + 33 * 8)[0]
    lcb_clx = struct.unpack_from("<I", word, fib_rgfclcb + 33 * 8 + 4)[0]
    if table is None or lcb_clx == 0:
        raise ValueError("no piece table (Clx) present")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # walk Clx: Prc entries (0x01, u16 cb, grpprl) precede the Pcdt (0x02)
    pos = 0
    plc = None
    while pos < len(clx):
        marker = clx[pos]
        if marker == 0x01:
            (cb,) = struct.unpack_from("<h", clx, pos + 1)
            pos += 3 + cb
        elif marker == 0x02:
            (lcb,) = struct.unpack_from("<I", clx, pos + 1)
            plc = clx[pos + 5 : pos + 5 + lcb]
            break
        else:
            raise ValueError(f"unexpected Clx marker {marker}")
    if plc is None:
        raise ValueError("no Pcdt in Clx")

    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    text_parts: List[str] = []
    for i in range(n):
        pcd_off = (n + 1) * 4 + i * 8
        (fc_raw,) = struct.unpack_from("<I", plc, pcd_off + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        cp_len = cps[i + 1] - cps[i]
        if compressed:
            chunk = word[fc // 2 : fc // 2 + cp_len]
            text_parts.append(chunk.decode("cp1252", "replace"))
        else:
            chunk = word[fc : fc + cp_len * 2]
            text_parts.append(chunk.decode("utf-16-le", "replace"))
    text = _clean_doc_text("".join(text_parts))
    lines = [ln for ln in text.split("\n")]
    # drop trailing empties from the document-final paragraph marks
    while lines and not lines[-1].strip():
        lines.pop()
    warnings = ["doc parsed natively (reference converts via soffice)"]
    return lines, warnings


# --- .ppt ---------------------------------------------------------------------

_TEXT_CHARS_ATOM = 0x0FA0
_TEXT_BYTES_ATOM = 0x0FA8


def extract_ppt_texts(payload: bytes) -> Tuple[List[str], List[str]]:
    """.ppt bytes → (texts, warnings): record-header scan of the PowerPoint
    Document stream for TextCharsAtom / TextBytesAtom payloads."""
    streams = ole2_streams(payload)
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("no PowerPoint Document stream")

    texts: List[str] = []

    def scan(data: bytes, depth: int = 0) -> None:
        pos = 0
        while pos + 8 <= len(data):
            ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", data, pos)
            body = data[pos + 8 : pos + 8 + rec_len]
            if (ver_inst & 0x000F) == 0x000F and depth < 8:  # container record
                scan(body, depth + 1)
            elif rec_type == _TEXT_CHARS_ATOM:
                texts.append(body.decode("utf-16-le", "replace").replace("\r", "\n"))
            elif rec_type == _TEXT_BYTES_ATOM:
                texts.append(body.decode("cp1252", "replace").replace("\r", "\n"))
            pos += 8 + rec_len

    scan(doc)
    warnings = ["ppt parsed natively (reference converts via soffice)"]
    return [t for t in texts if t.strip()], warnings
