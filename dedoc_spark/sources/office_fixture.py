"""Minimal XLSX / PPTX fixture generation for tests (zip + hand-built XML)."""

from __future__ import annotations

import io
import zipfile
from typing import List, Sequence

_SS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
_P = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'


def _col_ref(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def build_xlsx(sheets: Sequence[Sequence[Sequence[str]]]) -> bytes:
    """sheets: list of 2D string grids."""
    strings: List[str] = []

    def sref(s: str) -> int:
        strings.append(s)
        return len(strings) - 1

    sheet_xmls = []
    for grid in sheets:
        rows = []
        for r, row in enumerate(grid, start=1):
            cells = "".join(
                f'<c r="{_col_ref(c)}{r}" t="s"><v>{sref(val)}</v></c>' for c, val in enumerate(row)
            )
            rows.append(f'<row r="{r}">{cells}</row>')
        sheet_xmls.append(f'<?xml version="1.0"?><worksheet {_SS}><sheetData>{"".join(rows)}</sheetData></worksheet>')
    shared = "".join(f"<si><t>{s}</t></si>" for s in strings)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/workbook.xml", f'<?xml version="1.0"?><workbook {_SS}/>')
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst {_SS} count="{len(strings)}">{shared}</sst>',
        )
        for i, xml in enumerate(sheet_xmls, start=1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", xml)
    return buf.getvalue()


def _pptx_shape(texts: Sequence[str]) -> str:
    paras = "".join(f"<a:p><a:r><a:t>{t}</a:t></a:r></a:p>" for t in texts)
    return f"<p:sp><p:txBody>{paras}</p:txBody></p:sp>"


def _pptx_table(rows: Sequence[Sequence[str]]) -> str:
    trs = "".join(
        "<a:tr>" + "".join(f"<a:tc><a:txBody><a:p><a:r><a:t>{c}</a:t></a:r></a:p></a:txBody></a:tc>" for c in row) + "</a:tr>"
        for row in rows
    )
    return f"<p:graphicFrame><a:tbl>{trs}</a:tbl></p:graphicFrame>"


def build_pptx(slides: Sequence[dict]) -> bytes:
    """slides: [{'shapes': [[line, ...], ...], 'table': [[...]] or None}]"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("ppt/presentation.xml", f'<?xml version="1.0"?><p:presentation {_P} {_A}/>')
        for i, slide in enumerate(slides, start=1):
            body = "".join(_pptx_shape(s) for s in slide.get("shapes", []))
            if slide.get("table"):
                body += _pptx_table(slide["table"])
            xml = (
                f'<?xml version="1.0"?><p:sld {_P} {_A}><p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>'
            )
            zf.writestr(f"ppt/slides/slide{i}.xml", xml)
    return buf.getvalue()
