"""json2html debug rendering — parity with the reference's API renderer
(dedoc/api/api_utils.py:114-260): nested <p> blocks with &nbsp; indents and
node-id <sub> footers, <strong>/<em> for header/root/list_item paragraph
types, page separators, annotation span insertion (bold/italic/strike/
sub/sup/underline tags, table/attachment links appended at span end), and
bordered tables with display:none on invisible merged-cell clones.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from dedoc_spark.core.model import HierarchyLevel, Table
from dedoc_spark.core.tree import TreeNode

_BOOL_TAGS = {
    "bold": "b",
    "italic": "i",
    "strike": "strike",
    "subscript": "sub",
    "superscript": "sup",
    "underlined": "u",
}


def _annotations2html(text: str, annotations, table2id: Dict[str, int], attach2id: Dict[str, int], tabs: int = 0) -> str:
    """Span-insertion algorithm of api_utils.py:207-244: collect open/close
    tags per index, then insert back-to-front."""
    indexes: Dict[int, str] = {}
    for a in annotations:
        name, value = a.name, a.value
        if name not in _BOOL_TAGS and name not in ("table", "attachment") and not value.startswith("heading "):
            continue
        if name in _BOOL_TAGS and value == "False":
            continue
        indexes.setdefault(a.start, "")
        indexes.setdefault(a.end, "")
        if name == "table":
            indexes[a.end] += f' (<a href="#{value}">table {table2id.get(value, "?")}</a>)'
        elif name == "attachment":
            indexes[a.end] += f' (<a href="#{value}">attachment {attach2id.get(value, "?")}</a>)'
        else:
            tag = _BOOL_TAGS.get(name, "p")
            indexes[a.start] += f"<{tag}>"
            indexes[a.end] = f"</{tag}>" + indexes[a.end]
    for index, tag in sorted(indexes.items(), reverse=True):
        text = text[:index] + tag + text[index:]
    return text.replace("\n", f'<br>{"&nbsp;" * tabs}')


def table2html(table: Table, table2id: Dict[str, int]) -> str:
    """api_utils.py:246-260 shape: bordered table, merged-cell clones hidden."""
    title = f" {table.title}" if table.title else ""
    out = [f"<h4> table {table2id.get(table.uid, '?')}:{title}</h4>"]
    out.append(f'<table border="1" id={table.uid} style="border-collapse: collapse; width: 100%;">\n<tbody>\n')
    for row in table.cells:
        out.append("<tr>\n")
        for cell in row:
            td = "<td"
            if cell.invisible:
                td += ' style="display: none" '
            td += f' colspan="{cell.colspan}" rowspan="{cell.rowspan}">'
            cell_text = "\n".join(ln.line for ln in cell.lines)
            td += cell_text.replace("\n", "<br>") + "</td>\n"
            out.append(td)
        out.append("</tr>\n")
    out.append("</tbody>\n</table>")
    return "".join(out)


def json2html(tree: TreeNode, tables: Optional[List[Table]] = None) -> str:
    """Render the document tree (+ tables section) as debug HTML."""
    tables = tables or []
    table2id = {t.uid: i for i, t in enumerate(tables)}
    attach2id: Dict[str, int] = {}
    prev_page = [0]
    parts: List[str] = []

    def walk(node: TreeNode, tabs: int) -> None:
        page_id = node.page_id or 0
        if page_id != prev_page[0]:
            parts.append(f"<center><small><b>Page {prev_page[0] + 1}</b></small></center><hr>")
            prev_page[0] = page_id
        ptext = _annotations2html(node.text, node.annotations, table2id, attach2id, tabs)
        ptype = node.hl.line_type if node.hl is not None else HierarchyLevel.raw_text
        if ptype in (HierarchyLevel.header, HierarchyLevel.root):
            ptext = f"<strong>{ptext.strip()}</strong>"
        elif ptype == HierarchyLevel.list_item:
            ptext = f"<em>{ptext.strip()}</em>"
        else:
            ptext = ptext.strip()
        parts.append(
            f'<p> {"&nbsp;" * tabs} {ptext}     <sub> id = {node.node_id} ; type = {ptype} </sub></p>'
        )
        for sub in node.subparagraphs:
            walk(sub, tabs + 4)

    walk(tree, 0)
    if tables:
        parts.append("<h3> Tables: </h3>")
        for t in tables:
            parts.append(table2html(t, table2id))
            parts.append("<p>&nbsp;</p>")
    return "".join(parts)
