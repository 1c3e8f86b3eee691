"""RTF text extraction — pure Python control-word parser.

The reference converts .rtf via soffice→docx
(converters/concrete_converters/docx_converter.py:15-28); this native
reader covers the text layer: group stack, destination skipping
(fonttbl/stylesheet/info/pict/…), \\uN unicode escapes with \\ucN
fallback-byte skipping, hex escapes \\'hh decoded through the \\ansicpgN
codepage, and paragraph/line/cell control words mapped to breaks.
Styles are intentionally out of scope (best-effort text layer).
"""

from __future__ import annotations

import re
from typing import List, Tuple

_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "xe", "tc", "comment",
    "listtable", "listoverridetable", "generator", "themedata",
    "colorschememapping", "datastore", "latentstyles", "rsidtbl",
    "fchars", "lchars", "panose",
}

_BREAKS = {"par": "\n", "line": "\n", "row": "\n", "cell": "\t", "tab": "\t", "page": "\n", "sect": "\n"}

_CW_RE = re.compile(rb"\\([a-z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-z])|([{}])|([^\\{}]+)", re.S)


def extract_rtf_text(payload: bytes) -> Tuple[List[str], List[str]]:
    """.rtf bytes → (lines, warnings)."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not an RTF payload")
    cpg = re.search(rb"\\ansicpg(\d+)", payload[:256])
    codepage = f"cp{cpg.group(1).decode()}" if cpg else "cp1252"

    out: List[str] = []
    # group stack entries: (skipping, uc_count)
    stack: List[Tuple[bool, int]] = []
    skipping = False
    uc = 1
    pending_uc_skip = 0

    for m in _CW_RE.finditer(payload):
        word, param, hexbyte, escaped, brace, text = m.groups()
        if brace == b"{":
            stack.append((skipping, uc))
            continue
        if brace == b"}":
            if stack:
                skipping, uc = stack.pop()
            continue
        if word is not None:
            w = word.decode("ascii")
            if w == "uc":
                uc = int(param or 1)
            elif w == "u":
                if not skipping:
                    code = int(param or 0)
                    out.append(chr(code if code >= 0 else code + 65536))
                pending_uc_skip = uc
            elif w in _SKIP_DESTINATIONS:
                skipping = True
            elif not skipping and w in _BREAKS:
                out.append(_BREAKS[w])
            continue
        if hexbyte is not None:
            if pending_uc_skip > 0:
                pending_uc_skip -= 1
            elif not skipping:
                out.append(bytes([int(hexbyte, 16)]).decode(codepage, "replace"))
            continue
        if escaped is not None:
            if not skipping:
                if escaped == b"*":
                    # \* marks an unknown destination group → skip it
                    skipping = True
                elif escaped in (b"{", b"}", b"\\"):
                    out.append(escaped.decode("ascii"))
                elif escaped == b"~":
                    out.append("\xa0")
                elif escaped in (b"\n", b"\r"):
                    out.append("\n")
            continue
        if text is not None and not skipping:
            chunk = text.replace(b"\r", b"").replace(b"\n", b"")
            if pending_uc_skip > 0:
                take = min(pending_uc_skip, len(chunk))
                chunk = chunk[take:]
                pending_uc_skip -= take
            if chunk:
                out.append(chunk.decode(codepage, "replace"))

    text_full = "".join(out)
    lines = [ln for ln in text_full.split("\n")]
    while lines and not lines[-1].strip():
        lines.pop()
    while lines and not lines[0].strip():
        lines.pop(0)
    return lines, ["rtf parsed natively (reference converts via soffice)"]
